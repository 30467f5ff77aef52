"""IR dataset preparation: trim spectra to 1791 points, dedupe by SMILES,
shuffle, write parquet shards.

Functional equivalent of the reference's IR paper data processing
(reference paper_replication/ir/scripts/process_data.py behavior), on
pyarrow + the in-repo chem engine.

Usage:
    python process_data.py --input_dir raw/ --output_dir processed/ \
        [--spectrum_column ir_spectra] [--target_points 1791]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--spectrum_column", default="ir_spectra")
    parser.add_argument("--smiles_column", default="smiles")
    parser.add_argument("--target_points", type=int, default=1791)
    parser.add_argument("--seed", type=int, default=3247)
    parser.add_argument("--rows_per_shard", type=int, default=100_000)
    args = parser.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = [
        pq.read_table(f) for f in sorted(Path(args.input_dir).glob("*.parquet"))
    ]
    table = pa.concat_tables(tables)
    columns = {name: table.column(name).to_pylist() for name in table.column_names}
    n = len(columns[args.smiles_column])

    # Trim/pad spectra to target_points.
    spectra = []
    for spec in columns[args.spectrum_column]:
        spec = list(spec)[: args.target_points]
        if len(spec) < args.target_points:
            spec = spec + [0.0] * (args.target_points - len(spec))
        spectra.append(spec)
    columns[args.spectrum_column] = spectra

    # Dedupe by SMILES (first occurrence wins), then shuffle.
    seen = set()
    keep = []
    for i, smiles in enumerate(columns[args.smiles_column]):
        if smiles not in seen:
            seen.add(smiles)
            keep.append(i)
    rng = np.random.default_rng(args.seed)
    keep = [keep[i] for i in rng.permutation(len(keep))]
    columns = {k: [v[i] for i in keep] for k, v in columns.items()}

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    total = len(keep)
    for shard, start in enumerate(range(0, total, args.rows_per_shard)):
        end = min(start + args.rows_per_shard, total)
        shard_table = pa.table({k: v[start:end] for k, v in columns.items()})
        pq.write_table(shard_table, out_dir / f"data_{shard:04d}.parquet")
    print(f"Wrote {total} rows ({n - total} duplicates removed) to {out_dir}")


if __name__ == "__main__":
    main()
