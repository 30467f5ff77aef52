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
    model_config = {"arbitrary_types_allowed": True}


def _settings_config(**kw):
    kw["arbitrary_types_allowed"] = True
    return kw


ps.BaseSettings = _BaseSettings
ps.SettingsConfigDict = _settings_config
sys.modules.setdefault("pydantic_settings", ps)

# augmentations/datasets additionally import rdkit + omegaconf; the code
# paths exercised here never touch them.


class _FakeMol:
    pass


_rdchem = types.ModuleType("rdkit.Chem")
_rdchem.Mol = _FakeMol
_rdchem.MolFromSmarts = lambda s: _FakeMol()
_rdchem.MolFromSmiles = lambda s: None
_rd = types.ModuleType("rdkit")
_rd.Chem = _rdchem
sys.modules.setdefault("rdkit", _rd)
sys.modules.setdefault("rdkit.Chem", _rdchem)
_om = types.ModuleType("omegaconf")
_omd = types.ModuleType("omegaconf.dictconfig")
_omd.DictConfig = dict
_oml = types.ModuleType("omegaconf.listconfig")
_oml.ListConfig = list
_om.DictConfig = dict
_om.ListConfig = list
sys.modules.setdefault("omegaconf", _om)
sys.modules.setdefault("omegaconf.dictconfig", _omd)
sys.modules.setdefault("omegaconf.listconfig", _oml)
# datamodules imports pytorch_lightning for the (unused here) DataModule
_pl = types.ModuleType("pytorch_lightning")
_pl.LightningDataModule = object
sys.modules.setdefault("pytorch_lightning", _pl)

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

    # ---- augmentations ---------------------------------------------------
    from analytical_fm.data.augmentations import (
        horizontal_shift_augment, smooth_augment,
    )

    spec = inputs["spectra_1791"][0]
    # n_augments=2 only: the reference's fixed-size support grid crashes
    # for n=3 at 1791 points (its shipped configs use n=2; ours sizes the
    # grid per slice and supports both).
    ref = horizontal_shift_augment(np.asarray(spec), n_augments=2)
    out["horizontal_2"] = np.asarray(ref, dtype=np.float64)
    out["smooth"] = np.asarray(
        smooth_augment(np.asarray(spec), sigmas=[1.0, 2.5]), dtype=np.float64)

    # ---- msms_number -------------------------------------------------------
    from analytical_fm.data.preprocessing.msms_number import (
        MSMSNumberPreprocessor,
    )

    pre = MSMSNumberPreprocessor(normalise=True)
    pre.initialise({"M": inputs["msms"]}, "M")
    ref_out = pre(inputs["msms"])
    out["msms_number_values"] = ref_out["input_ids"].numpy().astype(np.float32)
    out["msms_number_mask"] = ref_out["attention_mask"].numpy().astype(np.float32)

    # ---- mixture stream ----------------------------------------------------
    import itertools

    from datasets import Dataset

    from analytical_fm.data.datasets import mix_spectra

    pool = Dataset.from_dict({
        k: ([list(map(float, r)) for r in v] if k == "IR" else v)
        for k, v in inputs["mix_pool"].items()
    })
    for ratios_name, ratios in (("equal", None), ("unbalanced", [0.3, 0.7])):
        cfg = {"n_compounds": 2, "compounds_ratio": ratios,
               "parallel_samples": 16, "train_max_n_samples": 64,
               "normalize": True}
        samples = list(itertools.islice(
            mix_spectra(pool, cfg, "train", seed=11), 24))
        out[f"mix_{ratios_name}_meta"] = json.dumps(
            [[s["Smiles"], s["Formula"], s["Additional_smiles"],
              s["Percentage"]] for s in samples])
        out[f"mix_{ratios_name}_ir"] = np.asarray(
            [s["IR"] for s in samples], dtype=np.float64)
        out[f"mix_{ratios_name}_target"] = np.asarray(
            [s["IR_target"] for s in samples], dtype=np.float64)

    # mixed=True passthrough branch (binary_real_data_mixed recipe:
    # reference datasets.py:90-105; normalize False is the shipped config,
    # True exercises the normalize path of the same branch).
    for mixed_name, normalize in (("mixed_raw", False), ("mixed_norm", True)):
        cfg = {"n_compounds": 2, "compounds_ratio": None,
               "parallel_samples": 16384, "train_max_n_samples": 0,
               "normalize": normalize, "mixed": True}
        samples = list(mix_spectra(pool, cfg, "train", seed=11))
        out[f"mix_{mixed_name}_meta"] = json.dumps(
            [[s["Smiles"], s["Formula"], s["Additional_smiles"],
              s["Percentage"]] for s in samples])
        out[f"mix_{mixed_name}_ir"] = np.asarray(
            [s["IR"] for s in samples], dtype=np.float64)
        out[f"mix_{mixed_name}_target"] = np.asarray(
            [s["IR_target"] for s in samples], dtype=np.float64)

    # ---- tokenizer -----------------------------------------------------------
    from analytical_fm.data.tokenizer import build_regex_tokenizer

    regex = (r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\.|=|#|-"
             r"|\+|\\|\/|:|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])")
    tok = build_regex_tokenizer(inputs["corpus"], regex, "isolated")
    ids = tok(inputs["corpus"])["input_ids"]
    out["tokenizer_ids"] = json.dumps([[int(x) for x in row] for row in ids])

    # ---- text_spectrum -----------------------------------------------------
    from analytical_fm.data.preprocessing.text_spectrum import (
        PeakPositionalEncodingPreprocessor, RunLengthEncodingPreprocessor,
        TextSpectrumPreprocessor,
    )

    spectra6 = inputs["spectra_1791"]
    spectra1990 = inputs["spectra_1990"]
    formulae = inputs["formulae"]

    ts_cases = [
        ("whole_int", dict(spectrum_to_text_x="whole_spectrum",
                           spectrum_to_text_y="integer"), spectra6),
        ("window_int", dict(spectrum_to_text_x="window",
                            spectrum_to_text_y="integer"), spectra1990),
        ("var_int", dict(spectrum_to_text_x="variance",
                         spectrum_to_text_y="integer"), spectra6),
        ("whole_freq", dict(spectrum_to_text_x="whole_spectrum",
                            spectrum_to_text_y="frequency_based_clustering"),
         spectra6),
    ]
    for name, kw, spec in ts_cases:
        pre = TextSpectrumPreprocessor(
            spectrum_tokens_x=60, spectrum_tokens_y=40,
            spectra_column="S", formula_column="F", **kw)
        pre.initialise({"S": spec.tolist(), "F": formulae}, "M")
        strings, _ = pre.process_spectra(np.asarray(spec))
        out[f"ts_{name}"] = json.dumps(strings)

    rle = RunLengthEncodingPreprocessor(
        spectrum_tokens_x=60, spectrum_tokens_y=40,
        spectrum_to_text_x="run_length_encoding", spectrum_to_text_y="integer",
        spectra_column="S", formula_column="F")
    rle.initialise({"M": spectra6.tolist()}, "M")
    strings, _ = rle.process_spectra(np.asarray(spectra6))
    out["ts_rle"] = json.dumps(rle.get_run_length_encoding(strings))

    peak = PeakPositionalEncodingPreprocessor(
        spectrum_tokens_x=60, spectrum_tokens_y=40,
        spectrum_to_text_x="threshold", spectrum_to_text_y="integer",
        modality_type="ir", spectra_column="S", formula_column="F")
    peak.initialise({"M": spectra6.tolist()}, "M")
    strings, indices = peak.process_spectra(np.asarray(spectra6))
    out["ts_peak_strings"] = json.dumps(strings)
    out["ts_peak_indices"] = np.asarray(
        [np.asarray(ix).flatten() for ix in indices], dtype=np.int64)

    # ---- collator (flagship Formula + IR patches -> Smiles) ---------------
    import torch  # noqa: F401  (reference collator returns torch tensors)
    from datasets import DatasetDict

    from analytical_fm.data.datamodules import MultiModalDataCollator
    from analytical_fm.data.preprocessing.patches import PatchPreprocessor
    from analytical_fm.data.tokenizer import build_regex_tokenizer as ref_brt

    smiles_regex = (r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\."
                    r"|=|#|-|\+|\\|\/|:|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])")
    formula_regex = r"([A-Z]{1}[a-z]?[0-9]*)"
    coll_rows = {
        "Formula": inputs["formulae"],
        "IR": [list(map(float, r)) for r in inputs["spectra_1791"]],
        "Smiles": inputs["corpus"],
    }
    ref_preps = {
        "Formula": ref_brt(coll_rows["Formula"], formula_regex, "isolated"),
        "Smiles": ref_brt(coll_rows["Smiles"], smiles_regex, "isolated"),
        "IR": PatchPreprocessor(patch_size=125, masking=False,
                                interpolation=False, overlap=1,
                                derivative=False),
    }
    ref_preps["IR"].initialise({"M": coll_rows["IR"]}, "M")
    coll_config = {
        "Formula": {"type": "text", "target": False},
        "IR": {"type": "1D_patches", "target": False},
        "Smiles": {"type": "text", "target": True},
    }
    ref_coll = MultiModalDataCollator(
        preprocessors=ref_preps, data_config=coll_config,
        model_type="CustomModel",
        dataset=DatasetDict({"train": Dataset.from_dict(coll_rows)}),
        max_source_length={"Formula": 12, "IR": 14},
        max_target_length=24,
    )
    coll_batch = [
        {k: coll_rows[k][i] for k in coll_rows} for i in range(4)
    ]
    ref_out = ref_coll(coll_batch)
    # save batch-first
    out["coll_formula_ids"] = ref_out["encoder_input"]["Formula"].T.numpy()
    out["coll_ir"] = (
        ref_out["encoder_input"]["IR"].transpose(0, 1).numpy().astype(np.float32))
    out["coll_pad_mask"] = ref_out["encoder_pad_mask"].T.numpy().astype(bool)
    out["coll_decoder_ids"] = (
        ref_out["decoder_input"]["Smiles"].T.numpy())
    out["coll_decoder_pad"] = ref_out["decoder_pad_mask"].T.numpy().astype(bool)
    out["coll_target"] = ref_out["target"].T.numpy()
    out["coll_target_mask"] = ref_out["target_mask"].T.numpy().astype(bool)
    out["coll_target_smiles"] = json.dumps(list(ref_out["target_smiles"]))

    # fitted IR standardization stats for our side (collator parity should
    # not depend on fitting-path equality, proven elsewhere)
    out["coll_ir_mean"] = np.float64(ref_preps["IR"].mean)
    out["coll_ir_std"] = np.float64(ref_preps["IR"].std)

    # ---- metric arithmetic (utils.calc_sampling_metrics) -------------------
    # rdkit is stubbed with IDENTITY canonicalization (MolToSmiles(x) == x),
    # so the golden pins the RANK/Top-N/per-class arithmetic, which is
    # chemistry-independent; canonicalization itself is covered by the chem
    # engine's own corpus tests.
    _rdchem.MolFromSmiles = lambda s: s if s else None
    _rdchem.MolToSmiles = lambda m: m
    _rdmd = types.ModuleType("rdkit.Chem.rdMolDescriptors")
    _rdmd.CalcMolFormula = lambda m: m
    _rdchem.rdMolDescriptors = _rdmd
    sys.modules.setdefault("rdkit.Chem.rdMolDescriptors", _rdmd)
    _rdlogger = types.ModuleType("rdkit.RDLogger")
    _rdlogger.DisableLog = lambda *_: None
    _rd.RDLogger = _rdlogger
    sys.modules.setdefault("rdkit.RDLogger", _rdlogger)
    import analytical_fm.utils as ref_utils

    samples = [
        ["<bos> C C O <eos>", "C C N", "c 1", "<pad>"],
        ["X", "C C ( C ) O", "C C O", "Z"],
        ["A", "B", "C", "D"],
        ["O = C", "<bos> O = C <eos> <pad>", "Q", "R"],
        ["C C O", "C C O", "C C O", "C C O"],
    ]
    targets = ["CCO", "CC(C)O", "CCO", "O=C", "CCN"]
    classes = ["0.5", "0.5", "0.1", "0.1", "0.5"]
    out["metrics_plain"] = json.dumps(ref_utils.calc_sampling_metrics(
        [list(s) for s in samples], list(targets), molecules=True))
    per_class = ref_utils.calc_sampling_metrics(
        [list(s) for s in samples], list(targets), classes=list(classes),
        molecules=True)
    out["metrics_classes"] = json.dumps(
        {str(k): v for k, v in per_class.items()})

    target = HERE / "reference_preproc_goldens.npz"
    np.savez(target, **out)
    print(f"wrote {target} with {len(out)} entries")


if __name__ == "__main__":
    main()
