"""Generate the tiny synthetic IR parquet fixture used by e2e tests.

Mirrors the shape of the reference's fixture (20 rows, columns smiles /
molecular_formula / ir_spectra with 1791 points) without copying its data.
"""

from pathlib import Path

import numpy as np


SMILES = [
    "CCO", "CCN", "CCC", "CCCO", "CCCN", "CC(=O)O", "CC(=O)N", "c1ccccc1",
    "Cc1ccccc1", "CCOC", "CCOCC", "CC(C)O", "CC(C)N", "CCCl", "CCBr",
    "CC(=O)OC", "CCS", "CCOC(C)=O", "c1ccncc1", "CC#N",
]


def main(out_dir: Path) -> Path:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from multimodalanalytical_tpu.chem import mol_formula

    rng = np.random.default_rng(42)
    rows_smiles, rows_formula, rows_spec = [], [], []
    x = np.linspace(0, 1, 1791)
    for i, smiles in enumerate(SMILES):
        formula = mol_formula(smiles)
        peaks = rng.uniform(0, 1, size=(5, 2))
        spec = np.zeros_like(x)
        for center, height in peaks:
            spec += height * np.exp(-((x - center) ** 2) / (2 * 0.01**2))
        spec += 0.01 * rng.standard_normal(x.shape)
        spec = np.clip(spec, 0, None)
        rows_smiles.append(smiles)
        rows_formula.append(formula)
        rows_spec.append(spec.astype(np.float32).tolist())

    out_dir.mkdir(parents=True, exist_ok=True)
    table = pa.table({
        "smiles": rows_smiles,
        "molecular_formula": rows_formula,
        "ir_spectra": rows_spec,
    })
    path = out_dir / "ir_data.parquet"
    pq.write_table(table, path)
    return path


if __name__ == "__main__":
    main(Path(__file__).parent / "test_data" / "ir_dataset")
