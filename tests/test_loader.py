"""Prefetch DataLoader lifecycle tests (ADVICE r1: producer-thread leak)."""

import threading
import time

from multimodalanalytical_tpu.data.datasets import TableDataset
from multimodalanalytical_tpu.training.loader import DataLoader


def _make_loader(n=64, batch=4, prefetch=2, collate_delay=0.0):
    def collator(columns):
        if collate_delay:
            time.sleep(collate_delay)
        return {"x": columns["x"]}

    return DataLoader(
        TableDataset({"x": list(range(n))}), collator, batch_size=batch,
        prefetch=prefetch,
    )


def test_prefetch_full_iteration():
    loader = _make_loader()
    batches = list(loader)
    assert len(batches) == 16
    assert batches[0]["x"] == [0, 1, 2, 3]


def test_early_abandon_stops_producer():
    """Breaking out of iteration (limit_val_batches) must not leave the
    producer thread blocked on q.put forever."""
    before = threading.active_count()
    loader = _make_loader(n=400, batch=4, prefetch=1, collate_delay=0.001)
    for i, _ in enumerate(loader):
        if i == 2:
            break
    # the generator's finally block runs on GC/close; force it deterministically
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_producer_error_propagates():
    loader = _make_loader()

    def bad_collator(columns):
        raise ValueError("boom")

    loader.collator = bad_collator
    try:
        list(loader)
    except ValueError as exc:
        assert "boom" in str(exc)
    else:
        raise AssertionError("producer error not propagated")


def test_predict_index_file(tmp_path):
    """test_idx selects exactly the indexed rows (reference
    datamodules.py:473-491)."""
    import numpy as np

    from multimodalanalytical_tpu.cli.common import build_loaders

    table = TableDataset({"x": list(range(100))})
    idx_path = tmp_path / "idx.npy"
    np.save(idx_path, np.asarray([5, 17, 42]))
    loaders = build_loaders(
        {"test": table}, lambda cols: {"x": cols["x"]}, batch_size=8, seed=0,
        test_idx=idx_path,
    )
    batches = list(loaders["test"])
    assert [v for b in batches for v in b["x"]] == [5, 17, 42]
