"""Generate reference-preprocessor parity goldens.

Runs the REFERENCE framework's preprocessor classes
(/root/reference/src/analytical_fm/data/preprocessing/*) on the synthetic
inputs from tests/test_reference_preproc_parity.py:build_inputs and writes
their outputs to reference_preproc_goldens.npz. Only this generator needs
the reference checkout (and a pydantic_settings stub — the preprocessors
import the reference's settings module but only read constants).

Usage: python tests/golden/make_reference_preproc_goldens.py
"""

import json
import sys
import types
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))            # tests/
sys.path.insert(0, str(HERE.parent.parent))     # repo root
sys.path.insert(0, "/root/reference/src")

# The reference's configuration.py needs pydantic_settings; the
# preprocessors only read constants off it.
import pydantic  # noqa: E402

ps = types.ModuleType("pydantic_settings")


class _BaseSettings(pydantic.BaseModel):
    model_config: dict = {}


ps.BaseSettings = _BaseSettings
ps.SettingsConfigDict = dict
sys.modules.setdefault("pydantic_settings", ps)

from test_reference_preproc_parity import PATCH_CONFIGS, build_inputs  # noqa: E402


def main() -> None:
    from analytical_fm.data.preprocessing.carbon import CarbonPreprocessor
    from analytical_fm.data.preprocessing.msms_text import MSMSTextPreprocessor
    from analytical_fm.data.preprocessing.multiplets import (
        MultipletPreprocessor,
    )
    from analytical_fm.data.preprocessing.patches import PatchPreprocessor

    inputs = build_inputs()
    out = {}

    for name, patch, mask, interp, overlap, deriv in PATCH_CONFIGS:
        spectra = inputs["spectra_1800" if interp else "spectra_1791"]
        pre = PatchPreprocessor(patch_size=patch, masking=mask,
                                interpolation=interp, overlap=overlap,
                                derivative=deriv)
        pre.initialise({"M": spectra.tolist()}, "M")
        out[f"patches_{name}_mean"] = np.float64(pre.mean)
        out[f"patches_{name}_std"] = np.float64(pre.std)
        rows = [list(r) for r in spectra[:4]] + ([] if mask else [None])
        patched, attn = pre(rows)
        out[f"patches_{name}_out"] = patched.numpy().astype(np.float32)
        out[f"patches_{name}_mask"] = attn.numpy().astype(bool)

    for intensities in (False, True):
        pre = CarbonPreprocessor(intensities=intensities)
        strings = pre.process_carbon(inputs["carbon"])
        out[f"carbon_{'int' if intensities else 'plain'}"] = json.dumps(strings)

    out["msms_strings"] = json.dumps(
        MSMSTextPreprocessor().process_msms(inputs["msms"]))

    for encoding, j_values in (("text", True), ("centroid", False),
                               ("numerical_encoding", False)):
        pre = MultipletPreprocessor(encoding=encoding, j_values=j_values)
        strings, numeric = pre.process_multiplets(
            inputs["multiplets"], encoding, j_values, initialise=True)
        key = f"multiplets_{encoding}_j{int(j_values)}"
        out[key + "_strings"] = json.dumps(strings)
        if encoding == "numerical_encoding":
            out[key + "_numeric"] = json.dumps(
                [list(map(float, v)) for v in numeric])

    target = HERE / "reference_preproc_goldens.npz"
    np.savez(target, **out)
    print(f"wrote {target} with {len(out)} entries")


if __name__ == "__main__":
    main()
