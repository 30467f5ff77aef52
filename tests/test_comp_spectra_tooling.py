"""Dataset-paper offline tooling tests (3D embedding, CPMD inputs, IR)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(
    0, str(Path(__file__).resolve().parent.parent
           / "paper_replication" / "comp_spectra_dataset")
)

from multimodalanalytical_tpu.chem import embed_3d  # noqa: E402


def _parse_xyz(xyz: str):
    lines = xyz.strip().splitlines()
    n = int(lines[0].split()[0])
    elements, coords = [], []
    for line in lines[2:2 + n]:
        parts = line.split()
        elements.append(parts[0])
        coords.append([float(x) for x in parts[1:4]])
    return elements, np.asarray(coords)


def test_embed_3d_geometry_sanity():
    """Bond lengths near covalent-radius sums; no atom collisions; correct
    explicit-H counts."""
    xyz = embed_3d("CCO", seed=3)
    elements, coords = _parse_xyz(xyz)
    assert elements == ["C", "C", "O", "H", "H", "H", "H", "H", "H"]

    def dist(i, j):
        return float(np.linalg.norm(coords[i] - coords[j]))

    assert 1.35 < dist(0, 1) < 1.70          # C-C ~1.54
    assert 1.25 < dist(1, 2) < 1.60          # C-O ~1.43
    n = len(elements)
    pair_min = min(dist(i, j) for i in range(n) for j in range(i + 1, n))
    assert pair_min > 0.85                    # nothing collapsed

    # determinism per seed
    assert embed_3d("CCO", seed=3) == xyz
    assert embed_3d("bad(") is None


def test_embed_3d_aromatic_ring_shape():
    elements, coords = _parse_xyz(embed_3d("c1ccccc1", seed=1))
    ring = coords[:6]
    center = ring.mean(axis=0)
    radii = np.linalg.norm(ring - center, axis=1)
    # regular-hexagon-ish: similar radii, edges ~1.39-1.45
    assert radii.std() < 0.15
    edges = [np.linalg.norm(ring[i] - ring[(i + 1) % 6]) for i in range(6)]
    assert all(1.25 < e < 1.6 for e in edges)
    # near-planar (pre-optimization tolerance)
    _, sv, _ = np.linalg.svd(ring - center)
    assert sv[-1] < 0.6


def test_cpmd_input_generation(tmp_path):
    import cpmd_inputs

    xyz = embed_3d("CCO", seed=0)
    path = tmp_path / "conf_0.xyz"
    path.write_text(xyz)
    written = cpmd_inputs.generate(path, geop=True, nmr=True, both=False,
                                   vdw=True)
    assert len(written) == 2
    geop = (tmp_path / "conf_0_geop_cpmd.in").read_text()
    nmr = (tmp_path / "conf_0_nmr_cpmd.in").read_text()
    assert "OPTIMIZE GEOMETRY" in geop and "VDW CORRECTION ON" in geop
    assert "*C-q4-pbe" in geop and "*O-q6-pbe" in geop and "*H-q1-pbe" in geop
    assert geop.count("&END") >= 4
    assert "LINEAR RESPONSE" in nmr and "NMR" in nmr
    # element counts: C2 H6 O1
    assert "\n 2\n" in geop and "\n 6\n" in geop and "\n 1\n" in geop


def test_ir_from_dipole_peak_positions(tmp_path):
    """Known oscillation frequencies must land at the right wavenumbers."""
    import ir_from_dipole as ir

    dt_fs = 0.25
    t = np.arange(4096) * dt_fs
    # 0.05 cycles/fs = 5e13 Hz -> 5e13 / (100 * c) ~ 1668 cm^-1
    dipole_x = np.sin(2 * np.pi * 0.05 * t)
    dipole = np.stack([dipole_x, np.zeros_like(t), np.zeros_like(t)], axis=1)
    autocorr = ir.dipole_autocorrelation(dipole)
    damped = ir.blackman_damp(autocorr)
    wn, _, _, _, _, spec_qm = ir.ir_spectrum(damped, dt_fs)
    peak = wn[int(np.argmax(spec_qm))]
    assert abs(peak - 1668) < 40, peak
