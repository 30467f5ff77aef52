"""Chem engine tests: canonicalisation, formulas, randomized SMILES."""

import pytest

from multimodalanalytical_tpu.chem import (
    atom_counts,
    canonicalize,
    is_valid,
    mol_formula,
    random_smiles,
)

EQUIVALENT_PAIRS = [
    ("CCO", "OCC"),
    ("c1ccccc1", "C1=CC=CC=C1"),
    ("c1ccccc1O", "Oc1ccccc1"),
    ("CC(=O)O", "OC(C)=O"),
    ("c1ccc2ccccc2c1", "C1=CC2=CC=CC=C2C=C1"),
    ("c1cc[nH]c1", "C1=CC=CN1"),
    ("c1ccncc1", "C1=CC=NC=C1"),
    ("c1ccoc1", "C1=CC=CO1"),
    ("c1ccsc1", "C1=CC=CS1"),
    ("CC(C)OC(=O)c1cncc(N)c1", "NC1=CN=CC(C(=O)OC(C)C)=C1"),
    ("[O-]C(=O)C", "CC([O-])=O"),
    ("C1CC2CCC1CC2", "C2CC1CCC2CC1"),
    ("N[C@@H](C)C(=O)O", "N[C@@H](C)C(O)=O"),
    ("CCS(=O)(=O)Nc1cc(Cl)cc(Oc2cccc(NC3=C(C)COC3=O)c2)c1OCCCl",
     "ClCCOc1c(cc(Cl)cc1NS(=O)(=O)CC)Oc1cccc(NC2=C(C)COC2=O)c1"),
]


@pytest.mark.parametrize("a,b", EQUIVALENT_PAIRS)
def test_canonical_equivalence(a, b):
    ca, cb = canonicalize(a), canonicalize(b)
    assert ca is not None
    assert ca == cb
    assert canonicalize(ca) == ca  # roundtrip-stable


@pytest.mark.parametrize(
    "bad", ["", "C(", "((((", "[Xx]", "C1CC", "C(C)(C)(C)(C)C", "xyz", "\x00", "]]"]
)
def test_invalid_inputs(bad):
    assert canonicalize(bad) is None
    assert not is_valid(bad)


def test_stereo_distinct():
    assert canonicalize("N[C@@H](C)C(=O)O") != canonicalize("N[C@H](C)C(=O)O")


@pytest.mark.parametrize(
    "smiles,formula",
    [
        ("CCO", "C2H6O"),
        ("c1ccccc1", "C6H6"),
        ("CC(=O)[O-]", "C2H3O2-"),
        ("O", "H2O"),
        ("C[NH3+]", "CH6N+"),
        ("CC(C)OC(=O)c1cncc(N)c1", "C9H12N2O2"),
    ],
)
def test_formula(smiles, formula):
    assert mol_formula(smiles) == formula


def test_random_smiles_roundtrip():
    base = canonicalize("CC(C)OC(=O)c1cncc(N)c1")
    variants = random_smiles("CC(C)OC(=O)c1cncc(N)c1", 16, seed=7)
    assert len(set(variants)) > 1  # actually randomized
    assert all(canonicalize(v) == base for v in variants)


def test_atom_counts():
    counts = atom_counts("CC(C)OC(=O)c1cncc(N)c1")
    # Atom order: C N O S P F Cl Br I B Si H Se As
    assert counts[0] == 9 and counts[1] == 2 and counts[2] == 2 and counts[11] == 12


DRUG_LIKE = [
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",                      # ibuprofen
    "CC(=O)Oc1ccccc1C(=O)O",                            # aspirin
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",                     # caffeine
    "c1ccc2c(c1)c(c[nH]2)CCN",                          # tryptamine
    "CC(C)(C)NCC(O)c1ccc(O)c(CO)c1",                    # salbutamol
    "Clc1ccccc1C2=NCc3ccccc3N2",                        # amine-bridged bicycle
    "O=C(O)c1ccccc1O",                                  # salicylic acid
    "N[C@@H](Cc1ccc(O)cc1)C(=O)O",                      # tyrosine (stereo)
    "C1CCC2(CC1)CCCCC2",                                # spiro
    "O=S(=O)(N)c1ccc(cc1)Cl",                           # sulfonamide
]


@pytest.mark.parametrize("smiles", DRUG_LIKE)
def test_canonical_invariance_under_enumeration(smiles):
    base = canonicalize(smiles)
    assert base is not None
    assert canonicalize(base) == base
    for variant in random_smiles(smiles, 24, seed=123):
        assert canonicalize(variant) == base, variant
