"""Tests for the paper-replication data-processing CLIs on synthetic fixtures.

The download stages are egress-blocked in this environment, but the
processing stages run here on fixtures shaped like the Zenodo artifacts
(column names, variable-length spectra, space-separated phosphor table).
Semantics asserted against the reference rules:
reference paper_replication/ir/scripts/process_data.py (trim to 1791,
dedupe by SMILES, shuffle), .../ir/scripts/filter_nist.py:24-49 (HAC,
fragment, stereo, charge, element filters),
.../phosphor/scripts/process_hack_data.py (canonicalize, dedupe,
5 <= HAC < 35, formula + smiles_rad_{1,2,3} targets).
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = Path(__file__).resolve().parent.parent


def run_script(script: Path, *args: str) -> str:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, str(script), *args],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert result.returncode == 0, result.stderr
    return result.stdout


class TestIRProcessData:
    @pytest.fixture()
    def processed(self, tmp_path):
        raw = tmp_path / "raw"
        raw.mkdir()
        # Shard A: one over-length spectrum (trim) and one short (pad).
        pq.write_table(
            pa.table(
                {
                    "smiles": ["CCO", "CCN"],
                    "ir_spectra": [
                        [float(i) for i in range(1800)],
                        [1.0] * 1500,
                    ],
                }
            ),
            raw / "chunk_a.parquet",
        )
        # Shard B: a duplicate of CCO (second occurrence must lose) + new row.
        pq.write_table(
            pa.table(
                {
                    "smiles": ["CCO", "CCC"],
                    "ir_spectra": [[9.0] * 1791, [2.0] * 1791],
                }
            ),
            raw / "chunk_b.parquet",
        )
        out = tmp_path / "processed"
        run_script(
            REPO / "paper_replication" / "ir" / "process_data.py",
            "--input_dir", str(raw), "--output_dir", str(out),
        )
        files = sorted(out.glob("*.parquet"))
        assert len(files) == 1
        table = pq.read_table(files[0])
        return {
            smiles: spec
            for smiles, spec in zip(
                table.column("smiles").to_pylist(),
                table.column("ir_spectra").to_pylist(),
            )
        }

    def test_dedupe_first_occurrence_and_row_count(self, processed):
        assert set(processed) == {"CCO", "CCN", "CCC"}
        # First occurrence wins: CCO keeps shard A's ramp, not shard B's 9s.
        assert processed["CCO"][0] == 0.0 and processed["CCO"][1] == 1.0

    def test_trim_and_pad_to_1791(self, processed):
        assert all(len(spec) == 1791 for spec in processed.values())
        # 1800-pt spectrum trimmed: last point is index 1790 of the ramp.
        assert processed["CCO"][-1] == 1790.0
        # 1500-pt spectrum zero-padded at the tail.
        assert processed["CCN"][1499] == 1.0 and processed["CCN"][1500] == 0.0


class TestFilterNIST:
    CASES = {
        # canonical-input smiles -> survives?
        "Oc1ccccc1": True,            # phenol: 7 heavy, neutral, CHO
        "CCOP(=O)(OCC)OCC": True,     # 11 heavy, P allowed
        "CCBr": False,                # 3 heavy: HAC <= 5
        "CCCCCCCCCCCCCC": False,      # 14 heavy: HAC must be < 14
        "not_a_smiles": False,        # invalid
        "CCCO.CCC": False,            # multi-fragment (7 heavy total)
        "C[C@H](N)C(=O)O": False,     # tetrahedral stereo
        "C/C=C/CCCO": False,          # E/Z stereo
        "CC[N+](C)(C)CC": False,      # charged (7 heavy)
        "C[Si](C)(C)c1ccccc1": False, # Si outside CHONSP+halogens
    }

    def test_filter_rules(self, tmp_path):
        raw = tmp_path / "raw"
        raw.mkdir()
        smiles = list(self.CASES)
        pq.write_table(
            pa.table({"smiles": smiles, "payload": list(range(len(smiles)))}),
            raw / "nist.parquet",
        )
        out = tmp_path / "filtered"
        stdout = run_script(
            REPO / "paper_replication" / "ir" / "filter_nist.py",
            "--input_dir", str(raw), "--output_dir", str(out),
        )
        table = pq.read_table(out / "nist.parquet")
        kept = set(table.column("smiles").to_pylist())
        expected = {s for s, keep in self.CASES.items() if keep}
        assert kept == expected
        # Non-SMILES columns ride along with their rows.
        payloads = table.column("payload").to_pylist()
        assert payloads == [smiles.index(s) for s in table.column("smiles").to_pylist()]
        assert f"Kept {len(expected)}/{len(smiles)}" in stdout


class TestPhosphorProcess:
    def test_process_hack_data(self, tmp_path):
        data = tmp_path / "exp.txt"
        rows = [
            "shift cansmi",
            "12.5 CCOP(=O)(OCC)OCC",   # keep: 11 heavy, P present
            "13.0 CCOP(=O)(OCC)OCC",   # duplicate canonical: dropped
            "1.0 CP",                  # 2 heavy < 5: dropped
            "2.0 xyz",                 # invalid: dropped
            "3.0 Oc1ccccc1",           # no phosphorus: env is None, dropped
            "7.7 CC(C)OP(C)(=O)OC(C)C",  # keep: second P molecule, 10 heavy
        ]
        data.write_text("\n".join(rows) + "\n")
        out = tmp_path / "out"
        run_script(
            REPO / "paper_replication" / "phosphor" / "process_hack_data.py",
            "--data_path", str(data), "--output_path", str(out),
        )
        table = pq.read_table(out / "phosphor.parquet")
        assert table.num_rows == 2
        assert set(table.column_names) == {
            "phosphor_shift", "smiles", "Formula",
            "smiles_rad_1", "smiles_rad_2", "smiles_rad_3",
        }
        shifts = table.column("phosphor_shift").to_pylist()
        assert shifts == [[12.5], [7.7]]
        # First-occurrence dedupe kept the 12.5 record, not the 13.0 one.
        formulas = table.column("Formula").to_pylist()
        assert formulas[0] == "C6H15O4P"
        # Environment targets are non-empty SMILES containing the P centre.
        for col in ("smiles_rad_1", "smiles_rad_2", "smiles_rad_3"):
            for env in table.column(col).to_pylist():
                assert env and "P" in env.upper()
