"""Scoring tests, mirroring the reference's golden cases
(reference tests/test_scoring.py)."""

from math import isclose

import numpy as np

from multimodalanalytical_tpu.evaluation import (
    calc_sampling_metrics,
    clean_sample,
    reject_sample,
    token_accuracy,
)


def test_clean_sample_golden():
    pad = " <pad>" * 20
    samples = [
        "<bos> C C ( C ) O C ( = O ) c 1 c n c c ( N ) c 1 <eos>" + pad,
        "<bos> C C S ( = O ) ( = O ) N c 1 c c ( Cl ) c c 1 <eos>" + pad,
    ]
    cleaned = [clean_sample(s, True) for s in samples]
    assert cleaned[0] == clean_sample("CC(C)OC(=O)c1cncc(N)c1", True)
    assert cleaned[1] == clean_sample("CCS(=O)(=O)Nc1cc(Cl)cc1", True)


def test_clean_sample_invalid_returns_none():
    assert clean_sample("<bos> C ( <eos>", True) is None
    # without canonicalisation, just strip
    assert clean_sample("<bos> C ( <eos>", False) == "C("


def test_topn_metrics():
    targets = ["CCO", "CCN", "CCC", "c1ccccc1", "CC(=O)O"]
    samples = [
        ["OCC", "C", "C", "C", "C"],          # rank 0 (canonical match)
        ["C", "NCC", "C", "C", "C"],          # rank 1
        ["C", "C", "C", "C", "CCC"],          # rank 4
        ["C", "C", "C", "C", "C"],            # no match
        ["bad(", "OC(C)=O", "C", "C", "C"],   # rank 1 (invalid beam skipped)
    ]
    metrics = calc_sampling_metrics(samples, targets, molecules=True)
    assert isclose(metrics["Top-1"], 1 / 5)
    assert isclose(metrics["Top-2"], 3 / 5)
    assert isclose(metrics["Top-5"], 4 / 5)


def test_topn_metrics_with_classes():
    targets = ["CCO", "CCN", "CCC", "CCCC"]
    samples = [["CCO"], ["X"], ["CCC"], ["CCCC"]]
    classes = [0.5, 0.5, 0.33, 0.33]
    metrics = calc_sampling_metrics(samples, targets, classes=classes, molecules=True)
    assert isclose(metrics[0.5]["Top-1"], 0.5)
    assert isclose(metrics[0.33]["Top-1"], 1.0)


def test_reject_sample():
    predictions = {
        "predictions": [["CCO", "CCN", "OCC"], ["CCC", "CC", "C"]],
        "targets": ["CCO", "CC"],
    }
    out = reject_sample(predictions, molecules=True)
    # C2H6O beams survive for target CCO; formula-mismatched beams dropped.
    assert out["predictions"][0] == ["CCO", "CCO", ""]
    assert out["predictions"][1] == ["CC", "", ""]


def test_token_accuracy():
    target = np.array([[1, 2, 3, -100], [4, 5, -100, -100]])
    pred = np.array([[1, 2, 9, 9], [4, 9, 9, 9]])
    assert isclose(token_accuracy(target, pred), 3 / 5)


def test_parallel_cache_warming_path(monkeypatch):
    """The thread-pool warming path never runs on the 1-core CI host by
    default (it gates on cpu_count); force it and check the scoring result
    is unchanged and the cache is actually warmed."""
    import os

    from multimodalanalytical_tpu.evaluation import metrics as M

    monkeypatch.setattr(os, "cpu_count", lambda: 4)
    targets = [f"{'C' * (i % 9 + 1)}O" for i in range(300)]
    samples = [[t, "CCN", "not_a_smiles"] for t in targets]

    M._cached_canonical.cache_clear()
    serial = M.calc_sampling_metrics(samples, targets, molecules=True)

    M._cached_canonical.cache_clear()
    M._warm_canonical_cache(
        list(targets) + [b for row in samples for b in row], min_unique=1)
    warmed_info = M._cached_canonical.cache_info()
    assert warmed_info.currsize > 0
    parallel = M.calc_sampling_metrics(samples, targets, molecules=True)
    assert parallel == serial
    assert parallel["Top-1"] == 1.0
