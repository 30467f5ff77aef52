"""Synthetic 31P-NMR dataset for the phosphor-paper recipe.

The phosphor paper predicts the local phosphorus environment (radius-1/2/3
SMILES around the P atom) from the 31P chemical shift + molecular formula
(reference paper_replication/phosphor/). Real data (Ilm-NMR-P31 / Zenodo
14971859) is unreachable here, so this generator builds a learnable
stand-in: P-containing molecules from a fragment grammar, with the shift a
deterministic function of the radius-2 P environment (plus small
molecule-dependent jitter) — shifts identify environments, environments
repeat across molecules, so the task composes to unseen molecules exactly
like the IR/multimodal generators.

Columns match the processing output: smiles, Formula, phosphor_shift_txt
(char-tokenized text), smiles_rad_{1,2,3}.
"""

from __future__ import annotations

import argparse
import hashlib
import itertools
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

P_CORES = [
    "P(=O)({a})({b})", "P({a})({b})", "OP(=O)({a})({b})", "P(=O)(O{a})O{b}",
    "P(=S)({a})({b})", "[P+]({a})({b})(C)C",
]
SUBS = ["C", "CC", "CCC", "OC", "OCC", "N", "NC", "c1ccccc1", "Cc1ccccc1",
        "O", "CC(C)C"]
TAILS = ["C", "CC", "CCO", "c1ccccc1", "CC(C)", "C(=O)OC", "CCN"]


def _hash_unit(text: str) -> float:
    digest = hashlib.sha256(text.encode()).digest()
    return int.from_bytes(digest[:4], "little") / 2**32


def gen_molecules(n: int, seed: int = 0):
    from multimodalanalytical_tpu.chem import canonicalize
    from multimodalanalytical_tpu.chem.smiles import atom_environment

    rng = np.random.default_rng(seed)
    candidates = []
    for core, a, b, tail in itertools.product(P_CORES, SUBS, SUBS, TAILS):
        candidates.append(tail + core.format(a=a, b=b))
    rng.shuffle(candidates)

    rows = []
    seen = set()
    for cand in candidates:
        if len(rows) >= n:
            break
        canon = canonicalize(cand)
        if canon is None or canon in seen or len(canon) > 60:
            continue
        envs = [atom_environment(canon, "P", r) for r in (1, 2, 3)]
        if any(e in (None, "") for e in envs):
            continue
        seen.add(canon)
        rows.append((canon, envs))
    return rows


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=3000)
    parser.add_argument("--out", type=Path, default=Path("/tmp/synth_p_dataset"))
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    from multimodalanalytical_tpu.chem import mol_formula

    rows = gen_molecules(args.n, args.seed)
    print(f"generated {len(rows)} distinct P molecules")
    out = {"smiles": [], "Formula": [], "phosphor_shift_txt": [],
           "smiles_rad_1": [], "smiles_rad_2": [], "smiles_rad_3": []}
    for smiles, envs in rows:
        # shift: radius-2 environment base in [-60, 160) ppm + radius-3
        # fine-structure within +-2 ppm — learnable and composable
        base = -60.0 + 220.0 * _hash_unit(f"p2:{envs[1]}")
        fine = -2.0 + 4.0 * _hash_unit(f"p3:{envs[2]}")
        shift = round(base + fine, 1)
        out["smiles"].append(smiles)
        out["Formula"].append(mol_formula(smiles) or "")
        out["phosphor_shift_txt"].append(f"{shift:.1f}")
        for r, env in zip((1, 2, 3), envs):
            out[f"smiles_rad_{r}"].append(env)

    args.out.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table(out), args.out / "phosphor.parquet")
    print(f"wrote {len(rows)} rows to {args.out}/phosphor.parquet")


if __name__ == "__main__":
    main()
