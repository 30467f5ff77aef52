"""SMARTS subset engine tests (functional-group featurization)."""

import numpy as np
import pytest

from multimodalanalytical_tpu.chem.smarts import match_functional_groups, smarts_match
from multimodalanalytical_tpu.configuration import DEFAULT_FUNC_GROUP_SMARTS
from multimodalanalytical_tpu.data.preprocessing import FunctionalGroupPreprocessor

CASES = [
    ("CCO", "Alcohol", True),
    ("CCO", "Ketone", False),
    ("CC(=O)C", "Ketone", True),
    ("CC(=O)O", "Carboxylic acid", True),
    ("CC(=O)OC", "Ester", True),
    ("CC(=O)OC", "Carboxylic acid", False),
    ("c1ccccc1", "Arene", True),
    ("CCN", "Amine", True),
    ("CC(=O)NC", "Amine", False),  # amide nitrogen excluded via !$(NC=O)
    ("CC(=O)NC", "Amide", True),
    ("CC#N", "Nitrile", True),
    ("CCS", "Thiol", True),
    ("CCSC", "Sulfide", True),
    ("CCCl", "Haloalkane", True),
    ("C=C", "Alkene", True),
    ("C#C", "Alkyne", True),
    ("Oc1ccccc1", "Phenol", True),
    ("CC=O", "Aldehyde", True),
    ("CC(=O)C", "Aldehyde", False),
    ("CN=C=O", "Isocyanate", True),
    ("CCP", "Phosphine", True),
    ("CC(=O)OC(C)=O", "Acid anhydride", True),
    ("CC=NC", "Imine", True),
    ("CCOS(C)(=O)=O", "Sulfonate", True),
]


@pytest.mark.parametrize("smiles,group,expect", CASES)
def test_functional_group_patterns(smiles, group, expect):
    assert smarts_match(smiles, DEFAULT_FUNC_GROUP_SMARTS[group]) is expect


def test_all_patterns_parse():
    for pattern in DEFAULT_FUNC_GROUP_SMARTS.values():
        smarts_match("CCO", pattern)  # raises on parse failure


def test_invalid_molecule_matches_nothing():
    assert not smarts_match("C(((", "[#6]")


def test_functional_group_preprocessor():
    prep = FunctionalGroupPreprocessor("default")
    vec = prep(["CC(=O)Oc1ccccc1C(=O)O", "CCO"])
    assert vec.shape == (2, 37)
    names = list(DEFAULT_FUNC_GROUP_SMARTS)
    aspirin = {names[i] for i in np.where(vec[0] > 0)[0]}
    assert {"Arene", "Ester", "Carboxylic acid"} <= aspirin
    ethanol = {names[i] for i in np.where(vec[1] > 0)[0]}
    assert "Alcohol" in ethanol and "Arene" not in ethanol
