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
    # fused aromatics WITH stereocenters / E,Z (VERDICT r2 item 7)
    ("naphthyl_ethanol_R", "C[C@H](O)c1ccc2ccccc2c1",
     "C[C@@H](c1cc2c(cc1)cccc2)O"),
    ("naphthyl_ethanol_S", "C[C@@H](O)c1ccc2ccccc2c1",
     "C[C@H](c1cc2c(cc1)cccc2)O"),
    ("indane_stereo", "C[C@H]1CCc2ccccc21", "C[C@H]1CCc2c1cccc2"),
    ("tetralin_stereo", "C[C@@H]1CCCc2ccccc21", "C[C@@H]1CCCc2c1cccc2"),
    ("styryl_naphthalene_E", "C(/C=C/c1ccc2ccccc2c1)",
     "C\\C=C\\c1cc2c(cc1)cccc2"),
    ("styryl_naphthalene_Z", "C(/C=C\\c1ccc2ccccc2c1)",
     "C\\C=C/c1cc2c(cc1)cccc2"),
    # charged + isotope combinations
    ("n15_ammonium", "[15NH4+]", "[15NH4+]"),
    ("c13_acetate", "C[13C](=O)[O-]", "C[13C]([O-])=O"),
    ("d4_ammonium", "[2H][N+]([2H])([2H])[2H]", "[2H][N+]([2H])([2H])[2H]"),
    ("zwitterion_ala_13c", "C[13C@H]([NH3+])C(=O)[O-]",
     "C[13C@@H](C([O-])=O)[NH3+]"),
    ("d_tma_chloride", "[2H]C([2H])([2H])[N+](C)(C)C.[Cl-]",
     "[2H]C([2H])([2H])[N+](C)(C)C.[Cl-]"),
    ("o18_sulfate", "[18O]S(=O)(=O)[O-]", "[O-]S(=O)(=O)[18O]"),
    # high-symmetry / degenerate skeletons
    ("coronene", "c1cc2ccc3ccc4ccc5ccc6ccc1c1c2c3c4c5c61",
     "c12c3c4c5c6c1c7ccc2ccc3ccc4ccc5ccc6cc7"),
    ("triptycene", "C1(c2ccccc2C2c3ccccc31)c1ccccc12",
     "C13c5c(C(c2c1cccc2)c4c3cccc4)cccc5"),
    ("twistane", "C1CC2CCC1C1CC2CC1", "C12C3CCC(C(C1)CC2)CC3"),
    ("barrelene", "C1=CC2C=CC1C=C2", "C1=CC2C=CC1C=C2"),
    # dependent ring stereo: neither carbon is an isolated stereocenter
    # (its two ring neighbors are symmetry-equivalent), but the PAIR of
    # marks encodes a real cis/trans diastereomer and must survive the
    # spurious-stereo cleaner.
    ("cis_14dmch", "C[C@H]1CC[C@H](C)CC1", "C[C@@H]1CC[C@H](CC1)C"),
    ("trans_14dmch", "C[C@H]1CC[C@@H](C)CC1", "C[C@@H]1CC[C@@H](CC1)C"),
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


# A stereo mark on a NON-stereogenic atom must be dropped, so annotated and
# unannotated renderings of the same molecule share one canonical string
# (RDKit AssignStereochemistry(cleanIt=True) parity — the reference's
# metrics parse predictions through RDKit, so a model emitting a redundant
# @ must not be scored as a different molecule).
SPURIOUS_STEREO = [
    ("chain", "C[C@H](C)O", "CC(C)O"),
    ("ring", "O[C@@H]1CCCCC1", "OC1CCCCC1"),
    ("benzylic_sym", "O[C@H]1c2ccccc2Cc2ccccc21", "OC1c2ccccc2Cc2ccccc21"),
    ("sym_fused", "C[C@H]1Cc2cc3ccccc3cc2C1", "CC1Cc2cc3ccccc3cc2C1"),
    ("sym_alkene_ez", "C/C=C(\\C)C", "CC=C(C)C"),
    ("geminal_ez", "C/C(C)=C(/F)F", "CC(C)=C(F)F"),
]


@pytest.mark.parametrize("name,marked,plain", SPURIOUS_STEREO,
                         ids=[s[0] for s in SPURIOUS_STEREO])
def test_spurious_stereo_dropped(name, marked, plain):
    cm, cp = canonicalize(marked), canonicalize(plain)
    assert cm == cp, (cm, cp)
    assert "@" not in cm and "/" not in cm and "\\" not in cm


# Tautomer-adjacent pairs are DISTINCT molecules (different H placement /
# bond order) and must never collapse to one canonical string — a collision
# here would silently inflate Top-N accuracy (VERDICT r2 weak item 7).
TAUTOMER_ADJACENT = [
    ("keto_enol", "CC(=O)C", "CC(O)=C"),
    ("pyridone_hydroxypyridine", "O=c1cccc[nH]1", "Oc1ccccn1"),
    ("amide_imidic_acid", "CC(=O)N", "CC(O)=N"),
    ("imine_enamine", "CC=N", "C=CN"),
    ("nitro_acinitro", "C[N+](=O)[O-]", "C[N+](O)=[O-]"),
    ("naphthol_naphthalenone", "Oc1ccc2ccccc2c1", "O=C1C=Cc2ccccc2C1"),
    ("enol_ether_vs_aldehyde", "COC=C", "CCC=O"),
]


@pytest.mark.parametrize("name,a,b", TAUTOMER_ADJACENT,
                         ids=[t[0] for t in TAUTOMER_ADJACENT])
def test_tautomer_adjacent_pairs_stay_distinct(name, a, b):
    ca, cb = canonicalize(a), canonicalize(b)
    assert ca is not None and cb is not None
    assert ca != cb


# Explicit neutral [H] atoms fold into the heavy neighbor's implicit count
# (RDKit MolFromSmiles removeHs parity): the explicit- and implicit-H
# renderings of one molecule must share a canonical string.
H_FOLD_EQUIVALENT = [
    ("plain", "C([H])O", "CO"),
    ("methane", "[H]C([H])([H])[H]", "C"),
    ("aromatic_cH", "c1ccccc1[H]", "c1ccccc1"),
    ("pyrrole_nH", "c1ccn([H])c1", "c1cc[nH]c1"),
    # chirality survives with the correct parity for every written H slot
    ("chiral_slot1", "C[C@](N)([H])C(=O)O", "C[C@@H](N)C(=O)O"),
    ("chiral_slot0", "C[C@]([H])(N)C(=O)O", "C[C@H](N)C(=O)O"),
    ("chiral_h_prev", "[H][C@](C)(N)C(=O)O", "C[C@H](N)C(=O)O"),
    # two hydrogens -> not a stereocenter; the mark must vanish entirely
    ("fake_stereo_2h", "C[C@H]([H])O", "CCO"),
    ("fake_stereo_2h_flip", "C[C@@H]([H])O", "CCO"),
    # E/Z riding the H bond transfers to the other substituent bond
    ("ez_via_h", "[H]/C(C)=C/F", "C/C=C\\F"),
    ("ez_via_h_cis", "[H]/C(C)=C\\F", "C/C=C/F"),
    # ...and drops when the end carries two hydrogens
    ("ez_2h_drops", "F/C=C\\[H]", "FC=C"),
    # ring-closure digits occupy their written neighbor slot; folding
    # around them keeps parity and the symmetric-ring mark still drops
    ("ring_fold_after_closure", "C1CC[C@@]1([H])F", "FC1CCC1"),
    ("ring_fold_before_closure", "C1CC[C@]([H])1F", "FC1CCC1"),
    ("ring_fold_h_prev", "F[C@]([H])1CCC1", "F[C@H]1CCC1"),
    # folded H counts toward selecting among MULTIPLE allowed valences
    # (review r3: sulfur must pick 6, not reject as hypervalent-at-2)
    ("sulfur_valence_fold", "S(C)(C)([H])[H]", "[SH2](C)C"),
    ("phosphorus_valence_fold", "P(C)(C)(C)([H])[H]", "[PH2](C)(C)C"),
    # marks on atoms with < 3 heavy neighbors are cleared: the writer has
    # nothing to permute, so the two written orders of ONE molecule would
    # otherwise canonicalize differently (F[C@H]Cl vs Cl[C@@H]F)
    ("carbene_mark_a", "F[C@H]Cl", "[CH](F)Cl"),
    ("carbene_mark_b", "Cl[C@@H]F", "[CH](F)Cl"),
    ("pyramidal_ph_mark", "[P@H](CC)C", "CC[P@@H]C"),
]


def test_pyramidal_sulfoxide_stereo_survives():
    """3 heavy neighbors IS enough for faithful parity normalization:
    sulfoxide enantiomers stay distinct through canonicalization."""
    a, b = canonicalize("C[S@](=O)CC"), canonicalize("C[S@@](=O)CC")
    assert a is not None and b is not None and a != b
    # ...and the same molecule written from the other side collapses.
    assert canonicalize("CC[S@@](=O)C") == a


@pytest.mark.parametrize("name,a,b", H_FOLD_EQUIVALENT,
                         ids=[h[0] for h in H_FOLD_EQUIVALENT])
def test_explicit_h_folds(name, a, b):
    ca, cb = canonicalize(a), canonicalize(b)
    assert ca is not None and ca == cb, (ca, cb)


def test_explicit_h_kept_when_meaningful():
    """Isotopic, charged, lone, and H-H hydrogens keep their explicit node
    (RDKit keeps these through removeHs too)."""
    assert canonicalize("[2H]OC") == "[2H]OC"
    assert canonicalize("[H+]") == "[H+]"
    assert canonicalize("[H][H]") == "[H][H]"
    assert canonicalize("[2H]C([2H])([2H])C") != canonicalize("CC")


def test_folded_h_still_counts_for_valence():
    """Folding must not legalize a hypervalent atom by quietly losing H."""
    assert canonicalize("C([H])([H])([H])([H])[H]") is None
    assert canonicalize("O([H])([H])[H]") is None


def test_dependent_ring_stereo_survives_cleaning():
    """cis- and trans-1,4-dimethylcyclohexane: each mark alone looks
    spurious (symmetric neighbors) but the pair encodes a diastereomer —
    the cleaner must keep them distinct from each other AND from the
    unannotated (stereo-unspecified) form."""
    cis = canonicalize("C[C@H]1CC[C@H](C)CC1")
    trans = canonicalize("C[C@H]1CC[C@@H](C)CC1")
    flat = canonicalize("CC1CCC(C)CC1")
    assert len({cis, trans, flat}) == 3
    # Written from the other ring direction, cis is still cis.
    assert canonicalize("C[C@@H]1CC[C@@H](C)CC1") == cis


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


# ---------------------------------------------------------------------------
# Meso / enantiomer topology (driver-round-3 corpus growth, VERDICT r2 #7).
#
# For a symmetric chain X-C*(..)-C*(..)-X written linearly, SAME tetrahedral
# marks at both centers denote the MESO compound (the written neighbor order
# reverses direction at the second center), and OPPOSITE marks denote the
# chiral (R,R)/(S,S) pair. Getting this backwards is the classic pitfall —
# these tests pin the engine's (correct) behavior: the meso compound's two
# mirror renderings are ONE molecule and must collapse to one string, while
# the enantiomers are TWO molecules and must never collapse (a collision
# would silently inflate Top-N; a split would deflate it).

MESO_SYSTEMS = [
    # (name, meso rendering A, meso rendering B (mirror), (R,R), (S,S), flat)
    ("butanediol",
     "C[C@H](O)[C@H](O)C", "C[C@@H](O)[C@@H](O)C",
     "C[C@H](O)[C@@H](O)C", "C[C@@H](O)[C@H](O)C",
     "CC(O)C(O)C"),
    ("tartaric",
     "OC(=O)[C@H](O)[C@H](O)C(=O)O", "OC(=O)[C@@H](O)[C@@H](O)C(=O)O",
     "OC(=O)[C@H](O)[C@@H](O)C(=O)O", "OC(=O)[C@@H](O)[C@H](O)C(=O)O",
     "OC(=O)C(O)C(O)C(=O)O"),
    ("dibromobutane",
     "C[C@H](Br)[C@H](Br)C", "C[C@@H](Br)[C@@H](Br)C",
     "C[C@H](Br)[C@@H](Br)C", "C[C@@H](Br)[C@H](Br)C",
     "CC(Br)C(Br)C"),
]


@pytest.mark.parametrize(
    "name,meso_a,meso_b,rr,ss,flat", MESO_SYSTEMS, ids=[m[0] for m in MESO_SYSTEMS]
)
def test_meso_collapses_enantiomers_stay_distinct(name, meso_a, meso_b, rr, ss, flat):
    c_meso_a, c_meso_b = canonicalize(meso_a), canonicalize(meso_b)
    c_rr, c_ss, c_flat = canonicalize(rr), canonicalize(ss), canonicalize(flat)
    # meso is ONE molecule: both mirror renderings collapse
    assert c_meso_a == c_meso_b, (c_meso_a, c_meso_b)
    # (R,R) and (S,S) are enantiomers: distinct strings
    assert c_rr != c_ss, (c_rr, c_ss)
    # meso, the two enantiomers, and the unspecified form: four distinct strings
    assert len({c_meso_a, c_rr, c_ss, c_flat}) == 4
    # every randomized re-rendering of each form stays on its string
    for smi, expect in ((meso_a, c_meso_a), (rr, c_rr), (ss, c_ss)):
        for r in random_smiles(smi, 25):
            assert canonicalize(r) == expect, (smi, r)


def test_isotopic_chirality():
    """A 13C label at one end of the meso skeleton creates a chiral pair."""
    a = canonicalize("[13CH3][C@H](O)[C@H](O)C")
    b = canonicalize("C[C@H](O)[C@H](O)[13CH3]")
    assert a is not None and b is not None
    assert a != b  # enantiomers by isotopic substitution


def test_spiro_and_bridged_stereocenters_survive():
    """Spiro and norbornane (endo/exo) marks are genuine and must be kept."""
    spiro_marked = canonicalize("C[C@]1(O)CCCC12CCCC2")
    spiro_plain = canonicalize("CC1(O)CCCC12CCCC2")
    assert "@" in spiro_marked and spiro_marked != spiro_plain
    endo = canonicalize("O[C@H]1C[C@@H]2CC[C@H]1C2")
    plain = canonicalize("OC1CC2CCC1C2")
    assert "@" in endo and endo != plain
    for r in random_smiles("O[C@H]1C[C@@H]2CC[C@H]1C2", 25):
        assert canonicalize(r) == endo, r


def test_adamantane_spurious_mark_dropped():
    """2-adamantanol's C2 has two identical ring branches: not stereogenic."""
    marked = canonicalize("O[C@H]1C2CC3CC(C2)CC1C3")
    plain = canonicalize("OC1C2CC3CC(C2)CC1C3")
    assert marked == plain
    assert "@" not in marked


def test_macrocyclic_ez_distinct():
    """Cyclodecene is large enough for genuine E/Z ring-bond stereo."""
    e = canonicalize("C1CCCC/C=C/CCC1")
    z = canonicalize("C1CCCC/C=C\\CCC1")
    plain = canonicalize("C1CCCCC=CCCC1")
    assert len({e, z, plain}) == 3
    for r in random_smiles("C1CCCC/C=C/CCC1", 25):
        assert canonicalize(r) == e, r


# ---------------------------------------------------------------------------
# Driver-round-4 corpus growth (VERDICT r3 item 6): aromatic N-H tautomer
# positional isomers, organometallic-adjacent charged fragments, stereo
# through macrocycles, multi-fragment salts with isotopes.

# Positional N-H isomers of aromatic azoles ARE distinct molecules (the H
# sits on a different ring nitrogen); a collision would silently merge
# e.g. adenine with its 7H tautomer in Top-N scoring. Each row: two
# DISTINCT molecules plus an alternate rendering of the first that must
# collapse onto it.
AROMATIC_NH_POSITIONAL = [
    ("indazole", "c1ccc2[nH]ncc2c1", "c1ccc2c(c1)c[nH]n2", "c1cc2cn[nH]c2cc1"),
    ("purine", "c1ncc2[nH]cnc2n1", "c1ncc2nc[nH]c2n1", "c1[nH]c2cncnc2n1"),
    ("adenine", "Nc1ncnc2[nH]cnc12", "Nc1ncnc2nc[nH]c12",
     "c1nc(N)c2c(n1)[nH]cn2"),
    ("methylimidazole", "Cc1c[nH]cn1", "Cc1cnc[nH]1", "Cc1nc[nH]c1"),
    ("methylpyrazole", "Cc1cc[nH]n1", "Cc1[nH]ncc1", "Cc1nn(cc1)[H]"),
    ("triazole", "c1nc[nH]n1", "c1n[nH]nc1", "n1cnc[nH]1"),
]


@pytest.mark.parametrize("name,a,b,a_alt", AROMATIC_NH_POSITIONAL,
                         ids=[t[0] for t in AROMATIC_NH_POSITIONAL])
def test_aromatic_nh_positional_isomers(name, a, b, a_alt):
    ca, cb, calt = canonicalize(a), canonicalize(b), canonicalize(a_alt)
    assert ca is not None and cb is not None, (ca, cb)
    assert ca != cb, f"{name}: positional N-H isomers collapsed to {ca}"
    assert calt == ca, f"{name}: rendering of the same tautomer diverged"
    for r in random_smiles(a, 25):
        assert canonicalize(r) == ca, r


# Organometallic-adjacent charged fragments (Grignard-like cations, metal
# carboxylates/cyanides, carbanions): must parse, keep charges, and order
# fragments canonically.
ORGANOMETALLIC_ADJACENT = [
    ("grignard_like", "C[Mg+].[Br-]", "C[Mg+].[Br-]"),
    ("mgcl2", "[Mg+2].[Cl-].[Cl-]", "[Cl-].[Cl-].[Mg+2]"),
    ("zn_acetate", "[Zn+2].CC([O-])=O.CC([O-])=O",
     "CC([O-])=O.CC([O-])=O.[Zn+2]"),
    ("ferricyanide", "[Fe+3].[C-]#N.[C-]#N.[C-]#N.[C-]#N.[C-]#N.[C-]#N",
     "[C-]#N.[C-]#N.[C-]#N.[C-]#N.[C-]#N.[C-]#N.[Fe+3]"),
    ("methyllithium_ionic", "[Li+].[CH3-]", "[CH3-].[Li+]"),
    ("potassium_enolate", "C=C([O-])C.[K+]", "C=C(C)[O-].[K+]"),
    ("copper_nitrate", "[Cu+2].[O-][N+](=O)[O-].[O-][N+](=O)[O-]",
     "[Cu+2].[O-][N+]([O-])=O.[O-][N+]([O-])=O"),
]


@pytest.mark.parametrize("name,smiles,expected", ORGANOMETALLIC_ADJACENT,
                         ids=[t[0] for t in ORGANOMETALLIC_ADJACENT])
def test_organometallic_adjacent_fragments(name, smiles, expected):
    out = canonicalize(smiles)
    assert out == expected, (out, expected)
    assert canonicalize(out) == out  # idempotent
    for r in random_smiles(smiles, 25):
        assert canonicalize(r) == expected, r


def test_macrocycle_stereo_classes():
    """Stereo through 12-membered macrocycles: E/Z ring bonds, transannular
    stereocenter pairs, and mixed E/Z pairs stay distinct; a lone mark in a
    locally-symmetric macrocycle is spurious and must drop."""
    e = canonicalize("C1/C=C/CCCCCCCCC1")
    z = canonicalize("C1/C=C\\CCCCCCCCC1")
    flat = canonicalize("C1C=CCCCCCCCCC1")
    assert len({e, z, flat}) == 3
    # methylcyclododecane C1 has two equivalent ring arms: not stereogenic
    assert "@" not in canonicalize("C[C@H]1CCCCCCCCCCC1")
    # transannular diol pair: cis/trans/flat all distinct
    cis = canonicalize("O[C@H]1CCCCC[C@H](O)CCCCC1")
    trans = canonicalize("O[C@H]1CCCCC[C@@H](O)CCCCC1")
    dflat = canonicalize("OC1CCCCCC(O)CCCCC1")
    assert len({cis, trans, dflat}) == 3
    # two ring double bonds: (E,E) vs (E,Z) vs unspecified
    ee = canonicalize("C1/C=C/CCCC/C=C/CCCC1")
    ez = canonicalize("C1/C=C/CCCC/C=C\\CCCC1")
    dd = canonicalize("C1C=CCCCCC=CCCCC1")
    assert len({ee, ez, dd}) == 3
    for r in random_smiles("O[C@H]1CCCCC[C@H](O)CCCCC1", 25):
        assert canonicalize(r) == cis, r


def test_multifragment_salt_order_invariance_with_isotopes():
    """Fragment write-order must not leak into the canonical string, and
    isotopic fragments must not merge with their unlabeled twins."""
    a = canonicalize("[2H]C([2H])([2H])[N+](C)(C)C.[13CH3]C([O-])=O")
    b = canonicalize("[13CH3]C([O-])=O.[2H]C([2H])([2H])[N+](C)(C)C")
    assert a is not None and a == b
    assert canonicalize("[Cl-].C[N+](C)(C)C") == canonicalize(
        "C[N+](C)(C)C.[Cl-]")
    assert canonicalize("[2H]O[2H].[Na+].[Cl-]") == canonicalize(
        "[Na+].[Cl-].[2H]O[2H]")
    # isotope-labeled vs unlabeled salts are different species
    assert canonicalize("[13CH3][N+](C)(C)C.[I-]") != canonicalize(
        "C[N+](C)(C)C.[I-]")
    # triple-fragment permutations all collapse
    perms = ["[Na+].[Cl-].[2H]O[2H]", "[Cl-].[2H]O[2H].[Na+]",
             "[2H]O[2H].[Na+].[Cl-]"]
    outs = {canonicalize(p) for p in perms}
    assert len(outs) == 1 and None not in outs


# ---------------------------------------------------------------------------
# Axial (allene) stereo (driver-round 4): an even cumulated system holds its
# terminal substituent planes perpendicular — with distinguishable termini
# substituents the molecule is axially chiral. Round-3 engines dropped the
# mark, collapsing enantiomer pairs (a Top-N inflation bug); the engine now
# models OpenSMILES extended-tetrahedral @/@@ on the central sp carbon
# (csrc/chem/chem.cpp perceive_axial_stereo). Reference behavior being
# matched: RDKit stereo perception as consumed by utils.py:22-41.

ALLENE_GOLDENS = [
    ("penta23diene_P", "CC=[C@]=CC", "CC=[C@]=CC"),
    ("penta23diene_M", "CC=[C@@]=CC", "CC=[C@@]=CC"),
    ("tetrasub_P", "CC(=[C@]=C(C)F)O", "CC(=[C@]=C(C)F)O"),
    ("tetrasub_M", "CC(=[C@@]=C(C)F)O", "CC(=[C@@]=C(C)F)O"),
    ("cyclohexa12diene_P", "C1CCC=[C@]=C1", "[C@]=1=CCCCC=1"),
    ("cyclohexa12diene_M", "C1CCC=[C@@]=C1", "[C@@]=1=CCCCC=1"),
]


@pytest.mark.parametrize("name,smiles,expected", ALLENE_GOLDENS,
                         ids=[g[0] for g in ALLENE_GOLDENS])
def test_allene_pinned_golden(name, smiles, expected):
    out = canonicalize(smiles)
    assert out == expected, out
    assert canonicalize(out) == out  # idempotent
    forms = {canonicalize(r) for r in random_smiles(smiles, 40, seed=7)}
    assert forms == {expected}, forms


def test_allene_enantiomers_and_flat_distinct():
    trio = {canonicalize("CC=[C@]=CC"), canonicalize("CC=[C@@]=CC"),
            canonicalize("CC=C=CC")}
    assert len(trio) == 3
    # combined with E/Z stereo elsewhere in the molecule
    assert canonicalize("F/C=C/C(=[C@]=CF)C") != canonicalize(
        "F/C=C/C(=[C@@]=CF)C")


ALLENE_SPURIOUS = [
    # one terminal carries two identical substituents -> not stereogenic
    ("tied_terminal", "CC=[C@]=C(C)C", "CC(=C=CC)C"),
    ("ch2_terminal", "C=[C@]=CC", "C=C=CC"),
    # heterocumulene termini / longer even cumulenes: out of scope, cleared
    ("ketene_like", "O=[C@]=CC", "CC=C=O"),
    ("pentatetraene", "CC=C=[C@]=C=CC", "CC=C=C=C=CC"),
]


@pytest.mark.parametrize("name,marked,plain", ALLENE_SPURIOUS,
                         ids=[s[0] for s in ALLENE_SPURIOUS])
def test_allene_spurious_or_unsupported_dropped(name, marked, plain):
    out = canonicalize(marked)
    assert out == plain, out
    assert "@" not in out


def test_allene_directional_marks_not_misread():
    """Directional-bond marks across an allene are not valid OpenSMILES
    allene stereo: they must clear (flat form), never crash, and never
    produce a string distinct from the unmarked rendering."""
    assert canonicalize("C/C=C=C/C") == canonicalize("CC=C=CC")
    assert canonicalize("C/C=C=C\\C") == canonicalize("CC=C=CC")


# ---------------------------------------------------------------------------
# Odd cumulene (butatriene-class) cis/trans stereo (driver-round 5). An odd
# cumulated chain is planar, so its termini carry alkene-like E/Z stereo
# spanning the whole chain (RDKit perceives these as stereo bonds through
# its extended stereo machinery; the reference canonicalizes predictions
# through RDKit, reference utils.py:22-41). Even chains >= 4 and hetero
# termini stay out of scope: marks clear, pinned below.

CUMULENE_EZ_CASES = [
    ("butatriene_E", "C/C=C=C=C/C"),
    ("butatriene_Z", "C/C=C=C=C\\C"),
    ("butatriene_F", "F/C=C=C=C/C"),
    ("hexapentaene_E", "C/C=C=C=C=C=C/C"),
]


@pytest.mark.parametrize("name,smiles", CUMULENE_EZ_CASES,
                         ids=[c[0] for c in CUMULENE_EZ_CASES])
def test_odd_cumulene_ez_survives_and_is_invariant(name, smiles):
    out = canonicalize(smiles)
    assert out is not None and "/" in out or "\\" in out, out
    assert canonicalize(out) == out  # idempotent
    forms = {canonicalize(r) for r in random_smiles(smiles, 50, seed=5)}
    assert forms == {out}, forms


def test_odd_cumulene_ez_trio_distinct():
    trio = {canonicalize("C/C=C=C=C/C"), canonicalize("C/C=C=C=C\\C"),
            canonicalize("CC=C=C=CC")}
    assert len(trio) == 3, trio
    penta = {canonicalize("C/C=C=C=C=C=C/C"),
             canonicalize("C/C=C=C=C=C=C\\C"),
             canonicalize("CC=C=C=C=C=CC")}
    assert len(penta) == 3, penta


def test_odd_cumulene_coupled_with_alkene_stereo():
    """A butatriene conjugated to a plain alkene through an allylic single
    bond: all four E/Z combinations must stay distinct and every rendering
    of each must collapse to one string."""
    combos = {}
    for s in ["C/C=C/C=C=C=C/C", "C/C=C/C=C=C=C\\C",
              "C/C=C\\C=C=C=C/C", "C/C=C\\C=C=C=C\\C"]:
        out = canonicalize(s)
        combos[s] = out
        forms = {canonicalize(r) for r in random_smiles(s, 40, seed=9)}
        assert forms == {out}, (s, forms)
    assert len(set(combos.values())) == 4, combos


CUMULENE_EZ_CLEARED = [
    # even chains >= 4: axial-like, out of scope -> directional marks clear
    ("pentatetraene_dirs", "C/C=C=C=C=C/C", "CC=C=C=C=CC"),
    # hetero terminus: out of scope -> cleared
    ("aza_butatriene", "C/N=C=C=C/C", "CC=C=C=NC"),
    # tied terminal substituents: not stereogenic
    ("tied_terminal", "C/C=C=C=C(/C)C", "CC(=C=C=CC)C"),
    # =CH2 terminus (explicit-H rendering folds to two identical Hs)
    ("ch2_terminus", "C/C=C=C=C/[H]", "C=C=C=CC"),
]


@pytest.mark.parametrize("name,marked,plain", CUMULENE_EZ_CLEARED,
                         ids=[c[0] for c in CUMULENE_EZ_CLEARED])
def test_odd_cumulene_out_of_scope_cleared(name, marked, plain):
    out = canonicalize(marked)
    assert out == canonicalize(plain) == plain, out
    assert "/" not in out and "\\" not in out


def test_odd_cumulene_conflict_rejected():
    # two same-side marks at one terminus: invalid, like alkene conflicts
    assert canonicalize("C(/F)(/Cl)=C=C=CC") is None


HYPERVALENT_BRACKET_CASES = [
    # (input, pinned canonical) — brackets are permissive on parse, so a
    # bracketed atom whose bond sum fits NO organic-subset shorthand
    # valence must KEEP its bracket on write: the bare form is rejected on
    # re-parse (P[I]N once emitted "NIP", a string the engine itself could
    # not read — found by a 31M-string fuzz, driver-round 5).
    ("P[I]N", "N[I]P"),
    ("[I](C)C", "C[I]C"),
    ("[Cl](C)C", "C[Cl]C"),
    ("[IH2]C", "C[IH2]"),
]


@pytest.mark.parametrize("smiles,expected", HYPERVALENT_BRACKET_CASES,
                         ids=[c[0] for c in HYPERVALENT_BRACKET_CASES])
def test_hypervalent_bracket_kept_on_write(smiles, expected):
    out = canonicalize(smiles)
    assert out == expected, out
    assert canonicalize(out) == out  # the emitted string must re-parse
    forms = {canonicalize(r) for r in random_smiles(smiles, 20, seed=3)}
    assert forms == {expected}, forms


def test_bare_hypervalent_halogen_rejected():
    # The bare organic-subset form stays invalid (RDKit also rejects
    # neutral divalent I/Cl): only the explicit bracket is permissive.
    assert canonicalize("CIC") is None
    assert canonicalize("NIP") is None
    assert canonicalize("CClC") is None


def test_cumulated_rings_never_crash():
    for s in ["C1=C=C=C1", "C1=C=C=C=C1", "C1=C=C=C=C=C1",
              "C/1=C=C=C=C1", "C=1=C=CC=1"]:
        out = canonicalize(s)
        if out is not None:
            assert canonicalize(out) == out, (s, out)


# ---------------------------------------------------------------------------
# Orbit-count tests (driver-round 4). Stronger than example pairs: enumerate
# EVERY full stereo-mark pattern of a symmetric skeleton and assert the number
# of distinct canonical strings equals the number of distinct stereoisomers
# known from group theory (Burnside over the proper-rotation group of the
# skeleton). This is convention-independent — it cannot be fooled by the
# author mislabeling which SMILES is which diastereomer — and it pins BOTH
# directions of the contract at once: distinct molecules stay distinct (no
# Top-N inflation) and equivalent mark patterns collapse (no Top-N deflation).


def _mark_patterns(n):
    import itertools

    return itertools.product(["@", "@@"], repeat=n)


def test_inositol_orbit_count_is_nine():
    """1,2,3,4,5,6-hexahydroxycyclohexane: 64 mark patterns -> exactly the 9
    inositols (cis, epi, allo, myo, muco, neo, scyllo, D-chiro, L-chiro).

    Burnside on the 2^6 face patterns under the ring's proper rotations
    (C6: 64+2+4+8+4+2 fixed; vertex C2 axes: 0; edge C2 axes: 8 each) gives
    (64+20+0+24)/12 = 9 orbits. Every ring carbon is a DEPENDENT stereo
    center (its own substituents tie), so this exercises the spurious-stereo
    cleaner's hardest case end to end."""
    outs = {}
    for bits in _mark_patterns(6):
        s = (
            "O[C" + bits[0] + "H]1"
            + "".join("[C" + m + "H](O)" for m in bits[1:5])
            + "[C" + bits[5] + "H]1O"
        )
        outs[bits] = canonicalize(s)
    assert None not in outs.values()
    classes = {}
    for bits, smi in outs.items():
        classes.setdefault(smi, []).append(bits)
    assert len(classes) == 9, sorted((len(v), k) for k, v in classes.items())
    # orbit sizes from the group action: three of 12, four of 6, two of 2
    sizes = sorted(len(v) for v in classes.values())
    assert sizes == [2, 2, 6, 6, 6, 6, 12, 12, 12], sizes
    # class membership is stable under randomized re-rendering
    for smi, members in classes.items():
        src = (
            "O[C" + members[0][0] + "H]1"
            + "".join("[C" + m + "H](O)" for m in members[0][1:5])
            + "[C" + members[0][5] + "H]1O"
        )
        for r in random_smiles(src, 10):
            assert canonicalize(r) == smi, (smi, r)


def test_trihydroxyglutarate_pseudoasymmetric_orbit_count_is_four():
    """2,3,4-trihydroxyglutaric acid: 8 mark patterns -> exactly 4
    stereoisomers (ribaric + xylaric mesos, where C3 is PSEUDO-ASYMMETRIC
    and its r/s mark must be KEPT, plus the D/L-arabinaric enantiomer pair,
    where C3 is non-stereogenic and its mark must be DROPPED)."""
    outs = {}
    for bits in _mark_patterns(3):
        s = (
            f"OC(=O)[C{bits[0]}H](O)[C{bits[1]}H](O)"
            f"[C{bits[2]}H](O)C(=O)O"
        )
        outs[bits] = canonicalize(s)
    assert None not in outs.values()
    classes = {}
    for bits, smi in outs.items():
        classes.setdefault(smi, []).append(bits)
    assert len(classes) == 4, sorted(classes)
    assert sorted(len(v) for v in classes.values()) == [2, 2, 2, 2]
    # the two meso classes keep a pseudo-asymmetric mark count of 3; the
    # enantiomer pair drops the middle mark (2 marks survive)
    mark_counts = sorted(smi.count("[C@") for smi in classes)
    assert mark_counts == [2, 2, 3, 3], mark_counts


def test_tetramethylcyclobutane_orbit_count():
    """1,2,3,4-tetramethylcyclobutane: 16 mark patterns -> exactly 4
    diastereomers (all-cis; cis-cis-trans; trans-trans (1,3); cis-trans
    alternating) — Burnside over C4 + edge/vertex C2 flips gives
    (16+2+4+2 + 4+4 + 0+0)/8 = 4, all achiral."""
    outs = {}
    for bits in _mark_patterns(4):
        s = (
            "C[C" + bits[0] + "H]1"
            + "".join("[C" + m + "H](C)" for m in bits[1:3])
            + "[C" + bits[3] + "H]1C"
        )
        outs[bits] = canonicalize(s)
    assert None not in outs.values()
    classes = {}
    for bits, smi in outs.items():
        classes.setdefault(smi, []).append(bits)
    assert len(classes) == 4, sorted((len(v), k) for k, v in classes.items())
    assert sorted(len(v) for v in classes.values()) == [2, 2, 4, 8]


def test_rendering_idempotence_fuzz_120k():
    """Scaled canonical-idempotence fuzz (VERDICT r3 item 6): 120k random
    renderings across the whole pinned corpus; every rendering must
    canonicalize to the pinned form, and re-canonicalization must be a
    fixed point. Any collision here is a release-blocking Top-N bug."""
    corpus = [(n, s, e) for n, s, e in GOLDENS]
    corpus += [(n, a, None) for n, a, b, _ in AROMATIC_NH_POSITIONAL]
    corpus += [(n, s, e) for n, s, e in ORGANOMETALLIC_ADJACENT]
    corpus += [(n, s, None) for n, s in CUMULENE_EZ_CASES]
    corpus += [(n, s, e) for n, s, e in ALLENE_GOLDENS]
    corpus += [(s, s, e) for s, e in HYPERVALENT_BRACKET_CASES]
    per = max(1, 120_000 // len(corpus))
    total = 0
    for name, smiles, expected in corpus:
        base = canonicalize(smiles)
        assert base is not None, name
        if expected is not None:
            assert base == expected, (name, base, expected)
        assert canonicalize(base) == base, name
        for r in random_smiles(smiles, per):
            assert canonicalize(r) == base, (name, r)
            total += 1
    assert total >= 100_000, total


# ---------------------------------------------------------------------------
# Driver-round-4 continuation corpus growth: ring-size-gated double-bond
# stereo (RDKit minBondRingSize-8 parity) and conjugated-polyene orbit
# counts (shared directional marks constrain adjacent double bonds — the
# classic canonicalization trap).

SMALL_RING_REDUNDANT_EZ = [
    # (name, marked, plain) — rings < 8 can only be cis, so the written
    # mark carries no information and must collapse onto the plain form
    # (RDKit AssignStereochemistry(cleanIt=True): minBondRingSize < 8).
    ("cyclopentene", "C1/C=C\\CC1", "C1C=CCC1"),
    ("cyclohexene", "C1/C=C\\CCC1", "C1C=CCCC1"),
    ("cyclohexene_trans_mark", "C1/C=C/CCC1", "C1C=CCCC1"),
    ("cycloheptene", "C1/C=C/CCCC1", "C1C=CCCCC1"),
    ("methylcyclohexene", "CC1=C(/CCCC1)C", "CC1=C(C)CCCC1"),
]


@pytest.mark.parametrize("name,marked,plain", SMALL_RING_REDUNDANT_EZ)
def test_small_ring_ez_marks_collapse(name, marked, plain):
    m, p = canonicalize(marked), canonicalize(plain)
    assert m is not None and m == p, (name, m, p)
    for r in random_smiles(marked, 20):
        assert canonicalize(r) == p, (name, r)


def test_ring_size_eight_boundary_keeps_ez():
    """Cyclooctene is the smallest ring with realizable trans geometry:
    E, Z and unspecified must stay three distinct strings."""
    e = canonicalize("C/1=C\\CCCCCC\\1")
    z = canonicalize("C1/C=C\\CCCCC1")
    plain = canonicalize("C1C=CCCCCC1")
    assert len({e, z, plain}) == 3
    for r in random_smiles("C1/C=C\\CCCCC1", 25):
        assert canonicalize(r) == z, r


def test_small_ring_rule_uses_smallest_ring_through_bond():
    """A stereo double bond in a macrocycle stays stereogenic even when a
    SMALL ring elsewhere shares atoms of the macrocycle; and a double bond
    whose own smallest ring is small loses its mark even inside a fused
    macrocycle."""
    # C2=C3 double bond: smallest ring through it is the 9-ring (the fused
    # 5-ring hangs off C3..C7 but does not contain the double bond).
    kept = canonicalize("C1/C=C2\\CCCC2CCCCC1")
    assert kept.count("/") + kept.count("\\") > 0, kept
    # Same macrocycle but the double bond inside the 5-ring: mark dropped.
    dropped = canonicalize("C1C/C2=C(\\CCC2)CCCCCC1")
    plain = canonicalize("C1CC2=C(CCC2)CCCCCC1")
    assert dropped == plain, (dropped, plain)


def test_hexadiene_orbit_count_is_four():
    """Hexa-2,4-diene: (E,E), (Z,Z), (E,Z)==(Z,E) by end-to-end symmetry,
    plus unspecified -> exactly 4 canonical strings from 7 renderings."""
    forms = {
        "EE": "C/C=C/C=C/C",
        "EE_flipped": "C\\C=C\\C=C\\C",  # global mark flip: same molecule
        "ZZ": "C/C=C\\C=C/C",
        "ZZ_flipped": "C\\C=C/C=C\\C",
        "EZ": "C/C=C/C=C\\C",
        "ZE": "C/C=C\\C=C\\C",
        "plain": "CC=CC=CC",
    }
    out = {k: canonicalize(v) for k, v in forms.items()}
    assert None not in out.values()
    assert out["EE"] == out["EE_flipped"]
    assert out["ZZ"] == out["ZZ_flipped"]
    assert out["EZ"] == out["ZE"]  # same molecule read backwards
    assert len(set(out.values())) == 4, out


def test_cyclooctadiene_orbit_count_is_four():
    """1,5-cyclooctadiene (8-ring: E/Z realizable): the C2 ring symmetry
    makes (E,Z) == (Z,E); (E,E), (Z,Z) and unspecified stay distinct.
    Labels hand-derived from OpenSMILES ring-closure mark semantics."""
    ez = canonicalize("C/1=C\\CC/C=C\\CC1")  # bond1 E, bond2 Z
    ze = canonicalize("C/1=C/CC/C=C/CC1")   # bond1 Z, bond2 E
    zz = canonicalize("C/1=C/CC/C=C\\CC1")
    ee = canonicalize("C/1=C\\CC/C=C/CC1")
    plain = canonicalize("C1=CCCC=CCC1")
    assert ez == ze, (ez, ze)
    assert len({ez, zz, ee, plain}) == 4, (ez, zz, ee, plain)
    for r in random_smiles("C/1=C\\CC/C=C\\CC1", 25):
        assert canonicalize(r) == ez, r


def test_polyene_shared_marks_and_terminal_ch2():
    """Conjugated chains: one written mark constrains two double bonds, and
    terminal =CH2 bonds are never stereogenic, so a mark adjacent to one
    only encodes the INTERNAL bond's geometry."""
    # (2E)-penta-1,3-diene written forward and reversed must collide.
    fwd = canonicalize("C=C/C=C/C")
    rev = canonicalize("C/C=C/C=C")
    plain = canonicalize("C=CC=CC")
    z = canonicalize("C=C/C=C\\C")
    assert fwd == rev
    assert len({fwd, z, plain}) == 3
    # octa-2,4,6-triene: all-E vs 4Z distinct; renderings collapse.
    eee = canonicalize("C/C=C/C=C/C=C/C")
    eze = canonicalize("C/C=C/C=C\\C=C\\C")
    assert eee != eze
    for s, c in (("C/C=C/C=C/C=C/C", eee), ("C/C=C/C=C\\C=C\\C", eze)):
        for r in random_smiles(s, 25):
            assert canonicalize(r) == c, (s, r)


def test_stilbene_aromatic_adjacent_ez():
    e = canonicalize("c1ccccc1/C=C/c1ccccc1")
    z = canonicalize("c1ccccc1/C=C\\c1ccccc1")
    plain = canonicalize("c1ccccc1C=Cc1ccccc1")
    assert len({e, z, plain}) == 3
    for r in random_smiles("c1ccccc1/C=C/c1ccccc1", 25):
        assert canonicalize(r) == e, r


# ---------------------------------------------------------------------------
# Pyramidal heteroatom stereocenters: RDKit's isAtomPotentialTetrahedralCenter
# policy — trivalent N inverts freely (marks drop) unless locked in a
# 3-membered ring; P/As and 3-coordinate S (sulfoxide, sulfonium) invert
# slowly (marks keep); 4-coordinate N (quaternary, N-oxide) is a full
# tetrahedral center.

def test_acyclic_trivalent_amine_marks_drop():
    a = canonicalize("[N@](C)(CC)CCC")
    b = canonicalize("[N@@](C)(CC)CCC")
    plain = canonicalize("N(C)(CC)CCC")
    assert a == b == plain, (a, b, plain)
    for r in random_smiles("[N@](C)(CC)CCC", 20):
        assert canonicalize(r) == plain, r


def test_azetidine_n_marks_drop_aziridine_keep():
    # 4-ring N still inverts: marks drop.
    assert canonicalize("CC1CC[N@]1CC") == canonicalize("CC1CCN1CC")
    # 3-ring (aziridine) locks inversion: @/@@/plain stay 3 distinct strings.
    az_a = canonicalize("CC1C[N@]1CC")
    az_b = canonicalize("CC1C[N@@]1CC")
    az_p = canonicalize("CC1CN1CC")
    assert len({az_a, az_b, az_p}) == 3, (az_a, az_b, az_p)
    for r in random_smiles("CC1C[N@]1CC", 20):
        assert canonicalize(r) == az_a, r


@pytest.mark.parametrize("name,a,b", [
    ("phosphine", "[P@](C)(CC)CCC", "[P@@](C)(CC)CCC"),
    ("sulfonium", "[S@+](C)(CC)CCC", "[S@@+](C)(CC)CCC"),
    ("quaternary_n", "[N@+](C)(CC)(CCC)CCCC", "[N@@+](C)(CC)(CCC)CCCC"),
    ("n_oxide", "C[N@+]([O-])(CC)CCC", "C[N@@+]([O-])(CC)CCC"),
    ("silicon", "[Si@](C)(F)(Cl)Br", "[Si@@](C)(F)(Cl)Br"),
])
def test_slow_inverting_heteroatom_stereo_survives(name, a, b):
    ca, cb = canonicalize(a), canonicalize(b)
    assert ca is not None and cb is not None and ca != cb, (name, ca, cb)
    for r in random_smiles(a, 15):
        assert canonicalize(r) == ca, (name, r)


# ---------------------------------------------------------------------------
# Heteroatom double-bond stereo (C=N imine/oxime, N=N azo: the lone pair
# acts as the second substituent, RDKit keeps E/Z) and exocyclic C=C.

@pytest.mark.parametrize("name,e,z,plain", [
    ("oxime", "C/C=N/O", "C/C=N\\O", "CC=NO"),
    ("imine", "C/C=N/C", "C/C=N\\C", "CC=NC"),
    ("azo", "C/N=N/C", "C/N=N\\C", "CN=NC"),
])
def test_heteroatom_double_bond_ez(name, e, z, plain):
    ce, cz, cp = canonicalize(e), canonicalize(z), canonicalize(plain)
    assert len({ce, cz, cp}) == 3, (name, ce, cz, cp)
    for r in random_smiles(e, 15):
        assert canonicalize(r) == ce, (name, r)


def test_exocyclic_double_bond_stereo():
    """Exocyclic C=C is NOT a ring bond, so the ring-size rule must not
    touch it; stereo survives iff the ring arms differ (inversion test)."""
    # methylenecyclohexane arms are identical: mark uninformative.
    assert canonicalize("C/C=C1\\CCCCC1") == canonicalize("CC=C1CCCCC1")
    # a 4-methyl makes the arms distinct: E and Z stay separate.
    e = canonicalize("C/C=C1\\CCCC(C)C1")
    z = canonicalize("C/C=C1/CCCC(C)C1")
    plain = canonicalize("CC=C1CCCC(C)C1")
    assert len({e, z, plain}) == 3, (e, z, plain)
    for r in random_smiles("C/C=C1\\CCCC(C)C1", 20):
        assert canonicalize(r) == e, r
