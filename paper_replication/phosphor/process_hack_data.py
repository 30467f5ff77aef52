"""Phosphor (31P-NMR) dataset preparation.

Canonicalises SMILES, dedupes, filters 5 <= heavy atoms < 35, builds the
chemical formula and the local phosphorus-environment targets
``smiles_rad_{1,2,3}`` (reference
paper_replication/phosphor/scripts/process_hack_data.py), on the in-repo
chem engine.

Usage:
    python process_hack_data.py --data_path exp.txt --output_path out/
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional


def get_env_smiles(smiles: str, radius: int) -> Optional[str]:
    from multimodalanalytical_tpu.chem.smiles import atom_environment

    env = atom_environment(smiles, "P", radius)
    if env in (None, "") and radius > 1:
        return get_env_smiles(smiles, radius - 1)
    return env


def main() -> None:
    from multimodalanalytical_tpu.chem import atom_counts, canonicalize, mol_formula
    from multimodalanalytical_tpu.chem.smiles import GUIDED_ATOM_LIST

    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=Path, required=True)
    parser.add_argument("--output_path", type=Path, required=True)
    parser.add_argument("--shift_column", default="shift")
    parser.add_argument("--smiles_column", default="cansmi")
    args = parser.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    with args.data_path.open() as f:
        header = f.readline().split()
        shift_i = header.index(args.shift_column)
        smiles_i = header.index(args.smiles_column)
        for line in f:
            parts = line.split()
            if len(parts) <= max(shift_i, smiles_i):
                continue
            rows.append((float(parts[shift_i]), parts[smiles_i]))

    h_index = GUIDED_ATOM_LIST.index("H")
    seen = set()
    out = {"phosphor_shift": [], "smiles": [], "Formula": [],
           "smiles_rad_1": [], "smiles_rad_2": [], "smiles_rad_3": []}
    for shift, raw in rows:
        canonical = canonicalize(raw)
        if canonical is None or canonical in seen:
            continue
        counts = atom_counts(canonical)
        heavy = sum(c for i, c in enumerate(counts) if i != h_index)
        if not (5 <= heavy < 35):
            continue
        envs = [get_env_smiles(canonical, r) for r in (1, 2, 3)]
        if any(e in (None, "") for e in envs):
            continue
        seen.add(canonical)
        out["phosphor_shift"].append([shift])
        out["smiles"].append(canonical)
        out["Formula"].append(mol_formula(canonical))
        for r, env in zip((1, 2, 3), envs):
            out[f"smiles_rad_{r}"].append(env)

    args.output_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table(out), args.output_path / "phosphor.parquet")
    print(f"Wrote {len(out['smiles'])} molecules to {args.output_path}")


if __name__ == "__main__":
    main()
