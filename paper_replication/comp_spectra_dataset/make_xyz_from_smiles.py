#!/usr/bin/env python
"""SMILES list -> conf_<i>.xyz starting geometries.

Replaces the reference's RDKit EmbedMolecule workflow (reference
scripts_ir_nmr_multimodal_comp_spectra_dataset/scripts/
make_xyz_file_from_smiles.py) with the in-repo distance-geometry embedder
(csrc/chem/chem.cpp, namespace embed3d). Geometries are refinement-grade
starting structures for the CPMD geometry optimization, not equilibrium
conformers.

Usage: python make_xyz_from_smiles.py --smiles list.txt [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from multimodalanalytical_tpu.chem import embed_3d  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--smiles", required=True,
                        help="text file, one SMILES per line")
    parser.add_argument("--out-dir", type=Path, default=Path("."))
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    smiles_list = [
        line.strip() for line in Path(args.smiles).read_text().splitlines()
        if line.strip()
    ]
    print(f"number of smiles: {len(smiles_list)} "
          f"(unique: {len(set(smiles_list))})")
    args.out_dir.mkdir(parents=True, exist_ok=True)

    failures = 0
    for idx, smiles in enumerate(smiles_list):
        xyz = embed_3d(smiles, seed=args.seed + idx)
        if xyz is None:
            print(f"SKIP {idx}: invalid SMILES {smiles!r}")
            failures += 1
            continue
        lines = xyz.splitlines()
        lines[1] = f"{idx} {smiles}"        # comment line: id + smiles
        (args.out_dir / f"conf_{idx}.xyz").write_text("\n".join(lines) + "\n")
    print(f"wrote {len(smiles_list) - failures} xyz files to {args.out_dir}")


if __name__ == "__main__":
    main()
