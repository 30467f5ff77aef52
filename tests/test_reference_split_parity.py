"""Split-policy parity against the REFERENCE's executed code, via goldens.

``tests/golden/reference_split_goldens.npz`` holds the split memberships
produced by running the reference's ``split`` / ``target_split`` /
``func_split`` (which call sklearn KFold / StratifiedKFold /
train_test_split and HF ``Dataset.train_test_split``) on the inputs below;
regenerate with ``python tests/golden/make_reference_split_goldens.py``
where the reference checkout exists. Our splitters now use the same
sklearn calls plus an exact replica of HF's train_test_split convention
(``np.random.default_rng(seed).permutation``), so fold membership — the
thing that makes published 5-fold CV numbers comparable — matches
bit-for-bit, including row ORDER for the random split's train/val sets.
"""

import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "reference_split_goldens.npz"

SPLIT_CASES = [(97, 0), (97, 1), (250, 3)]

# 120 rows over 40 unique targets (duplicates exercise the
# unique-target-level folding).
TARGET_ROWS = [f"T{i % 40:02d}" for i in range(120)]

# 3 multi groups x 13 members + 2 singleton groups.
FUNC_ROWS = (
    [["ester"], ["amine", "ether"], ["weird"]] * 13
    + [["unique_one"], ["unique_two", "rare"]]
)


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), (
        "missing committed golden; regenerate with "
        "tests/golden/make_reference_split_goldens.py"
    )
    return np.load(GOLDEN, allow_pickle=False)


@pytest.mark.parametrize("n,cv", SPLIT_CASES)
def test_random_split_matches_reference(golden, n, cv):
    from multimodalanalytical_tpu.data.datasets import TableDataset, split

    ours = split(TableDataset({"x": list(range(n))}), cv_split=cv, seed=3245)
    for part in ("train", "test", "validation"):
        ref = json.loads(str(golden[f"split_{n}_{cv}_{part}"]))
        assert ours[part]["x"] == ref, part


@pytest.mark.parametrize("cv", [0, 2])
def test_target_split_matches_reference(golden, cv):
    from multimodalanalytical_tpu.data.datasets import (
        TableDataset, target_split,
    )

    table = TableDataset({
        "x": list(range(len(TARGET_ROWS))), "target": TARGET_ROWS,
    })
    ours = target_split(table, "target", cv_split=cv, seed=3453)
    for part in ("train", "test", "validation"):
        ref = json.loads(str(golden[f"target_{cv}_{part}"]))
        assert sorted(ours[part]["x"]) == ref, part


@pytest.mark.parametrize("cv", [0, -1])
def test_func_split_matches_reference(golden, cv):
    from multimodalanalytical_tpu.data.datasets import (
        TableDataset, func_split,
    )

    table = TableDataset({
        "x": list(range(len(FUNC_ROWS))),
        "functional_group_names": FUNC_ROWS,
    })
    ours = func_split(table, cv_split=cv, seed=3453)
    for part in ("train", "test", "validation"):
        ref = json.loads(str(golden[f"func_{cv}_{part}"]))
        assert sorted(ours[part]["x"]) == ref, part
