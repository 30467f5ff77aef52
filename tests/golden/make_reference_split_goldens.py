"""Generate split-policy parity goldens from the REFERENCE's executed code.

Runs the reference's ``split`` / ``target_split`` / ``func_split``
(/root/reference/src/analytical_fm/data/datasets.py) on the deterministic
inputs from tests/test_reference_split_parity.py and records the resulting
split memberships (and row order where the downstream pipeline sees it).
Needs the reference checkout plus stubs for pydantic_settings / rdkit /
omegaconf (imported by the reference module but unused by the splitters).

Usage: python tests/golden/make_reference_split_goldens.py
"""

import json
import sys
import tempfile
import types
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
sys.path.insert(0, str(HERE.parent.parent))
sys.path.insert(0, "/root/reference/src")

import pydantic  # noqa: E402

ps = types.ModuleType("pydantic_settings")


class _BaseSettings(pydantic.BaseModel):
    model_config = {"arbitrary_types_allowed": True}


def _settings_config(**kw):
    kw["arbitrary_types_allowed"] = True
    return kw


ps.BaseSettings = _BaseSettings
ps.SettingsConfigDict = _settings_config
sys.modules.setdefault("pydantic_settings", ps)


class _FakeMol:
    pass


rdchem = types.ModuleType("rdkit.Chem")
rdchem.Mol = _FakeMol
rdchem.MolFromSmarts = lambda s: _FakeMol()
rdchem.MolFromSmiles = lambda s: None
rd = types.ModuleType("rdkit")
rd.Chem = rdchem
sys.modules.setdefault("rdkit", rd)
sys.modules.setdefault("rdkit.Chem", rdchem)
om = types.ModuleType("omegaconf")
omd = types.ModuleType("omegaconf.dictconfig")
omd.DictConfig = dict
oml = types.ModuleType("omegaconf.listconfig")
oml.ListConfig = list
om.DictConfig = dict
om.ListConfig = list
sys.modules.setdefault("omegaconf", om)
sys.modules.setdefault("omegaconf.dictconfig", omd)
sys.modules.setdefault("omegaconf.listconfig", oml)

from test_reference_split_parity import (  # noqa: E402
    FUNC_ROWS, SPLIT_CASES, TARGET_ROWS,
)


def main() -> None:
    import pandas as pd
    from datasets import Dataset

    from analytical_fm.data.datasets import (
        func_split, split, target_split,
    )

    out = {}

    for n, cv in SPLIT_CASES:
        ds = Dataset.from_dict({"x": list(range(n))})
        ref = split(ds, cv_split=cv, seed=3245)
        for part in ("train", "test", "validation"):
            # order matters downstream (sampling, loaders) — record as-is
            out[f"split_{n}_{cv}_{part}"] = json.dumps(list(ref[part]["x"]))

    ds = Dataset.from_dict({
        "x": list(range(len(TARGET_ROWS))), "target": TARGET_ROWS,
    })
    for cv in (0, 2):
        ref = target_split(ds, "target", cv_split=cv, seed=3453)
        for part in ("train", "test", "validation"):
            out[f"target_{cv}_{part}"] = json.dumps(sorted(ref[part]["x"]))

    with tempfile.TemporaryDirectory() as tmp:
        df = pd.DataFrame({
            "x": list(range(len(FUNC_ROWS))),
            "functional_group_names": FUNC_ROWS,
        })
        df.to_parquet(Path(tmp) / "data.parquet")
        for cv in (0, -1):
            ref = func_split(tmp, cv_split=cv, seed=3453)
            for part in ("train", "test", "validation"):
                out[f"func_{cv}_{part}"] = json.dumps(sorted(ref[part]["x"]))

    target = HERE / "reference_split_goldens.npz"
    np.savez(target, **out)
    print(f"wrote {target} with {len(out)} entries")


if __name__ == "__main__":
    main()
