"""Filter experimental (NIST-style) IR data to the paper's molecule space.

Reference criteria (reference paper_replication/ir/filter_nist.py:23-52):
canonicalisable SMILES, 5 < heavy-atom count < 14, single fragment, no
stereo, no charges, elements limited to CHONSP + halogens. Implemented on
the in-repo chem engine instead of RDKit.
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

ALLOWED = {"C", "H", "N", "O", "S", "P", "F", "Cl", "Br", "I"}


def keep_molecule(smiles: str) -> bool:
    from multimodalanalytical_tpu.chem import atom_counts, canonicalize
    from multimodalanalytical_tpu.chem.smiles import GUIDED_ATOM_LIST

    canonical = canonicalize(smiles)
    if canonical is None:
        return False
    if "." in canonical:          # multi-fragment
        return False
    if "@" in canonical or "/" in smiles or "\\" in smiles:  # stereo
        return False
    if re.search(r"\[[^\]]*[+-]", canonical):
        # charges only appear inside brackets, e.g. [O-], [N+], [NH2+]
        return False
    counts = atom_counts(canonical)
    if counts is None:
        return False
    by_atom = dict(zip(GUIDED_ATOM_LIST, counts))
    heavy = sum(v for k, v in by_atom.items() if k != "H")
    if not (5 < heavy < 14):
        return False
    for atom, count in by_atom.items():
        if count > 0 and atom not in ALLOWED:
            return False
    return True


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--smiles_column", default="smiles")
    args = parser.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    total_in = total_out = 0
    for f in sorted(Path(args.input_dir).glob("*.parquet")):
        table = pq.read_table(f)
        columns = {c: table.column(c).to_pylist() for c in table.column_names}
        smiles = columns[args.smiles_column]
        keep = [i for i, s in enumerate(smiles) if keep_molecule(s)]
        total_in += len(smiles)
        total_out += len(keep)
        pq.write_table(
            pa.table({k: [v[i] for i in keep] for k, v in columns.items()}),
            out_dir / f.name,
        )
    print(f"Kept {total_out}/{total_in} molecules")


if __name__ == "__main__":
    main()
