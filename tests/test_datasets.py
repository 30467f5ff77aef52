"""Dataset/split-policy tests."""

import numpy as np
import pytest

from multimodalanalytical_tpu.data.augmentations import (
    horizontal_shift_augment,
    smooth_augment,
)
from multimodalanalytical_tpu.data.datasets import (
    TableDataset,
    func_split,
    split,
    target_split,
)


def _table(n=100):
    rng = np.random.default_rng(0)
    return TableDataset({
        "smiles": [f"C{i}" for i in range(n)],
        "value": rng.random(n).tolist(),
    })


def test_random_split_partitions():
    table = _table(100)
    out = split(table, cv_split=0)
    assert set(out) == {"train", "test", "validation"}
    all_smiles = set(out["train"]["smiles"]) | set(out["test"]["smiles"]) | set(
        out["validation"]["smiles"]
    )
    assert len(all_smiles) == 100  # disjoint cover
    assert len(out["test"]) == 20  # 5-fold
    # different folds give different test sets
    out1 = split(table, cv_split=1)
    assert set(out["test"]["smiles"]) != set(out1["test"]["smiles"])
    # deterministic
    out_again = split(table, cv_split=0)
    assert out["test"]["smiles"] == out_again["test"]["smiles"]


def test_target_split_no_leakage():
    # duplicate targets must never straddle train/test
    targets = [f"T{i % 20}" for i in range(100)]
    table = TableDataset({"smiles": targets, "x": list(range(100))})
    out = target_split(table, "smiles", cv_split=0)
    train_targets = set(out["train"]["smiles"])
    test_targets = set(out["test"]["smiles"])
    val_targets = set(out["validation"]["smiles"])
    assert not (train_targets & test_targets)
    assert not (train_targets & val_targets)
    assert not (val_targets & test_targets)


def test_func_split_singletons_in_train():
    # 3 multi groups with >= 10 members each (sklearn StratifiedKFold with
    # n_splits=10 — the reference's exact call — requires it) + 1 singleton.
    groups = [["ester"], ["amine"], ["weird"]] * 13 + [["unique_one"]]
    table = TableDataset({
        "smiles": [f"C{i}" for i in range(40)],
        "functional_group_names": groups,
    })
    out = func_split(table, cv_split=0)
    # the singleton-group molecule must be in train
    assert "C39" in out["train"]["smiles"]
    assert "C39" not in out["test"]["smiles"]


def test_horizontal_shift_preserves_length():
    spec = np.sin(np.linspace(0, 10, 600)).tolist()
    out = horizontal_shift_augment(spec, n_augments=2)
    assert len(out) == 2
    assert all(len(s) == 600 for s in out)


def test_smooth_augment_reduces_variance():
    rng = np.random.default_rng(0)
    spec = rng.standard_normal(500)
    out = smooth_augment(spec, sigmas=[2.0])
    assert len(out) == 1
    assert np.var(out[0]) < np.var(spec)
