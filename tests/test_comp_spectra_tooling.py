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


# ---------------------------------------------------------------------------
# Figure tooling (figures.py): collect / figure6 / figure7 / nmr-panel /
# ir-plot, replacing the reference's four matplotlib figure scripts.
# ---------------------------------------------------------------------------

import os
import subprocess

FIGURES = (Path(__file__).resolve().parent.parent
           / "paper_replication" / "comp_spectra_dataset" / "figures.py")


def _run_figures(cwd, *args):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent)
    env.setdefault("MPLBACKEND", "Agg")
    result = subprocess.run(
        [sys.executable, str(FIGURES), *args],
        capture_output=True, text=True, timeout=300, cwd=cwd, env=env,
    )
    assert result.returncode == 0, result.stderr
    return result.stdout


def test_collect_and_dipole_figures(tmp_path):
    rng = np.random.default_rng(0)
    for split, runs in (("frames", ["r0", "r1"]), ("mols", ["r2"])):
        root = tmp_path / split
        ids = root / "list.txt"
        root.mkdir()
        ids.write_text("\n".join(runs) + "\n")
        for run in runs:
            d = root / run / "EVAL" / "t40"
            d.mkdir(parents=True)
            np.save(d / "y_pred.npy", rng.normal(size=(5, 3)))
            np.save(d / "y_true.npy", rng.normal(size=(5, 3)))
        out = _run_figures(
            tmp_path, "collect", "--list", str(ids), "--prefix", str(root),
            "--out_prefix", str(tmp_path / f"unseen_{split}"),
        )
        assert "y_pred" in out and "y_true" in out
    # Stacking: frames has 2 runs x 5 rows.
    assert np.load(tmp_path / "unseen_frames_y_pred.npy").shape == (10, 3)

    _run_figures(tmp_path, "figure6",
                 "--frames_prefix", str(tmp_path / "unseen_frames"),
                 "--molecules_prefix", str(tmp_path / "unseen_mols"),
                 "--out", str(tmp_path / "figure6.png"), "--dpi", "72")
    _run_figures(tmp_path, "figure7",
                 "--prefix", str(tmp_path / "unseen_mols"),
                 "--out", str(tmp_path / "figure7.png"), "--dpi", "72")
    assert (tmp_path / "figure6.png").stat().st_size > 1000
    assert (tmp_path / "figure7.png").stat().st_size > 1000


def test_nmr_panel(tmp_path):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    records = [
        {"smiles": s,
         "averaged_frames": {
             "h_nmr_peaks_grouped_frame_ave": [1.1 + i, 3.2],
             "c_nmr_peaks_grouped_frame_ave": [20.0 + i, 130.5],
         }}
        for i, s in enumerate(["CCO", "CCO", "c1ccccc1", "CC(=O)O"])
    ]  # duplicate CCO exercises the first-occurrence dedupe
    parquet = tmp_path / "NMR_data.parquet"
    pq.write_table(pa.Table.from_pylist(records), parquet)
    exp = [{"smiles": r["smiles"], "h_nmr_peaks": [1.0], "c_nmr_peaks": [25.0]}
           for r in records]
    exp_json = tmp_path / "exp.json"
    exp_json.write_text(json.dumps(exp))

    # Placeholder-exp path (no --exp_json) and real-exp path both render;
    # indices address the DEDUPED record list (3 unique molecules).
    _run_figures(tmp_path, "nmr-panel", "--nmr_parquet", str(parquet),
                 "--indices", "0,2", "--out", str(tmp_path / "a.png"),
                 "--dpi", "72")
    _run_figures(tmp_path, "nmr-panel", "--nmr_parquet", str(parquet),
                 "--exp_json", str(exp_json), "--indices", "1",
                 "--out", str(tmp_path / "b.png"), "--dpi", "72")
    assert (tmp_path / "a.png").stat().st_size > 1000
    assert (tmp_path / "b.png").stat().st_size > 1000


def test_ir_plot_from_parquet(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    shards = tmp_path / "zenodo"
    shards.mkdir()
    freq = list(np.linspace(100.0, 4000.0, 64))
    for shard, ids in enumerate([(0, 1), (2,)]):
        pq.write_table(
            pa.Table.from_pylist([
                {"id": i, "smiles": "CCO",
                 "Frequency(cm^-1)": freq,
                 "ir_spectra": list(np.random.default_rng(i).normal(size=64))}
                for i in ids
            ]),
            shards / f"IR_data_chunk{shard}.parquet",
        )
    # Index 2 lives in the second shard: exercises cross-shard indexing.
    out = _run_figures(tmp_path, "ir-plot", "--parquet_dir", str(shards),
                       "--index", "2", "--out_dir", str(tmp_path),
                       "--dpi", "72")
    assert "ir_spectra_id_2.png" in out
    assert (tmp_path / "ir_spectra_id_2.png").stat().st_size > 1000
