"""Adversarial chem-engine corpus: the classes the fragment-grammar corpus
(tests/test_chem_corpus.py) never generates.

The engine defines the headline accuracy metric (evaluation/metrics.py),
so canonicalization must be stable on fused/bridged aromatics, charges,
isotopes, stereo combinations, ring-closure digits > 9, and degenerate
high-symmetry cages — and must never crash on malformed input.

Goldens below are pinned regressions: a canonicalization-algorithm change
that alters any of them must be deliberate (update the golden with the
reason in the commit).
"""

from __future__ import annotations

import random
import string

import pytest

from multimodalanalytical_tpu.chem import canonicalize, random_smiles

# (name, input, pinned canonical form)
GOLDENS = [
    # fused / bridged aromatics
    ("naphthalene", "c1ccc2ccccc2c1", "c12c(cccc1)cccc2"),
    ("naphthalene_kekulized", "C1=CC2=CC=CC=C2C=C1", "c12c(cccc1)cccc2"),
    ("anthracene", "c1ccc2cc3ccccc3cc2c1", "c13c(cc2c(c1)cccc2)cccc3"),
    ("pyrene", "c1cc2ccc3cccc4ccc(c1)c2c34", "c12c3c4ccc1cccc2ccc3ccc4"),
    ("azulene", "c1ccc2cccc2cc1", "c12c(ccc1)ccccc2"),
    ("biphenylene", "c1ccc2c(c1)-c1ccccc1-2", "c12-c3c(-c1cccc2)cccc3"),
    ("porphyrin_core",
     "c1cc2cc3ccc(cc4ccc(cc5ccc(cc1n2)[nH]5)n4)[nH]3",
     "c12cc5ccc(cc4ccc(cc3ccc(cc(cc1)n2)[nH]3)n4)[nH]5"),
    # bridged / caged aliphatics (degenerate symmetry stresses the
    # Morgan-refinement tie-breaking)
    ("norbornane", "C1CC2CCC1C2", "C12CC(CC1)CC2"),
    ("bicyclo222octane", "C1CC2CCC1CC2", "C12CCC(CC1)CC2"),
    ("adamantane", "C1C2CC3CC1CC(C2)C3", "C12CC3CC(C1)CC(C2)C3"),
    ("cubane", "C12C3C4C1C5C2C3C45", "C12C3C4C1C5C2C3C45"),
    ("spiro_decane", "C1CCC2(CC1)CCCC2", "C12(CCCC1)CCCCC2"),
    # charges
    ("ammonium", "[NH4+]", "[NH4+]"),
    ("acetate_a", "[O-]C(=O)C", "CC([O-])=O"),
    ("acetate_b", "CC(=O)[O-]", "CC([O-])=O"),
    ("salt_pair", "[Na+].[Cl-]", "[Cl-].[Na+]"),
    ("tetramethylammonium", "C[N+](C)(C)C", "C[N+](C)(C)C"),
    ("n_methylpyridinium", "c1cc[n+](C)cc1", "C[n+]1ccccc1"),
    # isotopes
    ("c13_methane", "[13CH4]", "[13CH4]"),
    ("deuterated_methanol", "[2H]OC", "[2H]OC"),
    ("c13_benzene", "[13C]1=CC=CC=C1", "[13c]1ccccc1"),
    ("isotope_stereo", "[13C@H](F)(Cl)Br", "F[13C@H](Cl)Br"),
    # tetrahedral x E/Z combinations
    ("at_ez_trans", "C[C@H](F)/C=C/C", "C/C=C/[C@H](C)F"),
    ("at_ez_cis", "C[C@@H](F)/C=C\\C", "C\\C=C/[C@@H](C)F"),
    ("double_stereo", "C[C@H](F)/C=C/[C@@H](Cl)Br",
     "C[C@@H](\\C=C\\[C@@H](Cl)Br)F"),
    ("ez_in_ring", "C1/C=C\\CCCCCCC1", "C/1=C/CCCCCCCC\\1"),
    # the @ mark flips when the neighbor written order flips (N moves from
    # 2nd to 4th neighbor): same molecule, opposite-looking symbol.
    ("alanine_l", "C[C@H](N)C(=O)O", "C[C@@H](C(=O)O)N"),
    ("alanine_d", "C[C@@H](N)C(=O)O", "C[C@H](C(=O)O)N"),
    # ring-closure digits beyond 9
    ("percent_closure", "C%10CCCCC%10", "C1CCCCC1"),
    ("mixed_closures", "C%12CCCCC%12CC%13CCCC%13", "C2(CC1CCCCC1)CCCC2"),
    ("interleaved_closures", "C1CCC%11CC1CC%11C", "CC1C2CC(C1)CCC2"),
]


@pytest.mark.parametrize("name,smiles,expected", GOLDENS,
                         ids=[g[0] for g in GOLDENS])
def test_pinned_golden(name, smiles, expected):
    assert canonicalize(smiles) == expected


@pytest.mark.parametrize("name,smiles,expected", GOLDENS,
                         ids=[g[0] for g in GOLDENS])
def test_idempotent(name, smiles, expected):
    assert canonicalize(expected) == expected


@pytest.mark.parametrize("name,smiles,expected", GOLDENS,
                         ids=[g[0] for g in GOLDENS])
def test_randomized_renderings_collapse(name, smiles, expected):
    """40 randomized atom orders -> exactly one canonical form."""
    forms = {canonicalize(v) for v in random_smiles(smiles, 40, seed=7)}
    assert forms == {expected}


def test_stereo_distinctions_survive():
    """Enantiomers and E/Z isomers must canonicalize to distinct strings."""
    assert canonicalize("C[C@H](N)C(=O)O") != canonicalize("C[C@@H](N)C(=O)O")
    assert canonicalize("F/C=C/F") != canonicalize("F/C=C\\F")
    # ... but a stereo assignment written from the other direction is the
    # same molecule.
    assert canonicalize("N[C@@H](C)C(=O)O") == canonicalize("C[C@H](N)C(=O)O")
    assert canonicalize("F/C=C/F") == canonicalize("F\\C=C\\F")


MALFORMED = [
    "", "(", ")", "C(", "C)", "C1CC", "[C", "C[", "[]", "[1]", "%", "C%1",
    "C%%10CC%%10", "c1ccccc1c", "[Xx]", "[C@@@H]", "C1CC1C2", "C11",
    "[13]", "[+]", "\x00C", "🌟", "c1cc1", "C#", "=C", "C1(C1)",
]


@pytest.mark.parametrize("smiles", MALFORMED, ids=lambda s: repr(s)[:20])
def test_malformed_rejected_cleanly(smiles):
    assert canonicalize(smiles) is None


def test_fuzz_100k_no_crash():
    """10^5 random SMILES-alphabet strings: never crash, never hang;
    anything that parses must be idempotent under re-canonicalization."""
    alphabet = "CNOSPcnos()[]=#+-@/\\123456789%HFIBrl." + string.ascii_letters
    rng = random.Random(0xC0FFEE)
    parsed = 0
    for _ in range(100_000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 24)))
        out = canonicalize(s)
        if out is not None:
            assert isinstance(out, str) and out != ""
            parsed += 1
            assert canonicalize(out) == out, (s, out)
    # Sanity on the generator itself: the fuzz must exercise both paths.
    assert parsed > 100


def test_long_chain_and_deep_nesting():
    """Pathological but valid sizes: 5k-atom chain, 200-deep branches."""
    chain = "C" * 5000
    assert canonicalize(chain) == chain
    nested = "C(" * 200 + "C" + ")" * 200
    out = canonicalize(nested)
    assert out is not None and out.count("C") == 201
