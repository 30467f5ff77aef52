"""Preprocessor unit tests: shapes, masking, serialization roundtrips."""

import json

import numpy as np
import pytest

from multimodalanalytical_tpu.data.data_utils import (
    fit_preprocessors,
    load_preprocessors_artifact,
    save_preprocessors,
)
from multimodalanalytical_tpu.data.preprocessing import (
    CarbonPreprocessor,
    MSMSNumberPreprocessor,
    MSMSTextPreprocessor,
    MultipletPreprocessor,
    NormalisePreprocessor,
    PatchPreprocessor,
    RunLengthEncodingPreprocessor,
    TextSpectrumPreprocessor,
)
from multimodalanalytical_tpu.data.tokenizer import build_regex_tokenizer

SMILES_REGEX = (
    r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\.|=|#|-|\+|\\\\|\/|:"
    r"|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])"
)


def test_regex_tokenizer_bos_eos():
    tok = build_regex_tokenizer(["CCO", "c1ccccc1", "CC(=O)O"], SMILES_REGEX)
    out = tok(["CCO"], padding="max_length", max_length=10)
    ids = out["input_ids"][0]
    assert ids[0] == tok.bos_token_id
    assert ids[4] == tok.eos_token_id
    assert (ids[5:] == tok.pad_token_id).all()
    assert out["attention_mask"][0].sum() == 5
    decoded = tok.batch_decode(out["input_ids"], skip_special_tokens=True)
    assert decoded[0] == "C C O"


def test_regex_tokenizer_json_roundtrip():
    from multimodalanalytical_tpu.data.tokenizer import RegexTokenizer

    tok = build_regex_tokenizer(["CCO", "CCN"], SMILES_REGEX)
    tok2 = RegexTokenizer.from_json(json.loads(json.dumps(tok.to_json())))
    a = tok(["CCO"], padding="max_length", max_length=8)["input_ids"]
    b = tok2(["CCO"], padding="max_length", max_length=8)["input_ids"]
    assert (a == b).all()


def test_patch_preprocessor_shapes():
    rng = np.random.default_rng(0)
    spectra = rng.random((4, 1800)).tolist()
    prep = PatchPreprocessor(patch_size=125, masking=False, interpolation=False)
    prep.fit(spectra)
    patches, mask = prep(spectra)
    assert patches.shape == (4, 14, 125)  # 1800 // 125 = 14
    assert mask.shape == (4, 14)
    assert mask.all()  # no masking, no None rows


def test_patch_preprocessor_none_rows_masked():
    rng = np.random.default_rng(0)
    spectra = rng.random((3, 1000)).tolist()
    spectra[1] = None
    prep = PatchPreprocessor(patch_size=100, masking=False, interpolation=False)
    prep.fit(spectra)
    patches, mask = prep(spectra)
    assert (patches[1] == (0 - prep.mean) / prep.std).all()
    assert mask[1].sum() == 0
    assert mask[0].all() and mask[2].all()


def test_patch_preprocessor_masking_zero_patches():
    spectra = [[0.0] * 100 + [1.0] * 100, [1.0] * 200]
    prep = PatchPreprocessor(patch_size=100, masking=True, interpolation=False)
    prep.fit(spectra)
    prep.mean, prep.std = 0.0, 1.0  # patch of zeros stays zero-sum
    _, mask = prep(spectra)
    assert mask[0].tolist() == [0, 1]
    assert mask[1].tolist() == [1, 1]


def test_patch_preprocessor_state_roundtrip():
    prep = PatchPreprocessor(patch_size=50, masking=True, interpolation=False)
    prep.fit(np.random.default_rng(1).random((5, 200)).tolist())
    prep2 = PatchPreprocessor.from_state(json.loads(json.dumps(prep.state_dict())))
    spectra = np.random.default_rng(2).random((2, 200)).tolist()
    a, am = prep(spectra)
    b, bm = prep2(spectra)
    assert np.allclose(a, b) and (am == bm).all()


MULTIPLETS = [
    [
        {"rangeMax": 7.3, "rangeMin": 7.1, "category": "m", "nH": 5, "j_values": None},
        {"rangeMax": 2.4, "rangeMin": 2.2, "category": "q", "nH": 2, "j_values": "7.1_7.2"},
    ],
    None,
    [{"rangeMax": 1.2, "rangeMin": 1.0, "category": "t", "nH": 3, "j_values": "7.0"}],
]


def test_multiplet_text_encoding():
    prep = MultipletPreprocessor(encoding="text")
    prep.fit(MULTIPLETS)
    strings, _ = prep.process_multiplets(MULTIPLETS)
    assert strings[0] == "1HNMR 7.30 7.10 m 5H | 2.40 2.20 q 2H"
    assert strings[1] == ""
    out = prep(MULTIPLETS)
    assert out["input_ids"].shape[1] == prep.max_sequence_length
    assert out["attention_mask"][1].sum() == 0  # None row fully masked
    assert out["attention_mask"][0].sum() > 0


def test_multiplet_j_values():
    prep = MultipletPreprocessor(encoding="text", j_values=True)
    prep.fit(MULTIPLETS)
    strings, _ = prep.process_multiplets(MULTIPLETS)
    assert "J 7.10 7.20" in strings[0]


def test_multiplet_numerical_encoding():
    prep = MultipletPreprocessor(encoding="numerical_encoding")
    prep.fit(MULTIPLETS)
    out = prep(MULTIPLETS)
    assert "numerical_values" in out
    assert out["numerical_values"].shape == out["input_ids"].shape
    # Slot 0 = BOS (1.0), slot 1 = "1HNMR" token (1.0), slots 2-3 = the two
    # [NUM] tokens carrying rangeMax/rangeMin (reference multiplets.py:199-230).
    assert out["numerical_values"][0, 0] == 1.0
    assert out["numerical_values"][0, 1] == 1.0
    assert np.isclose(out["numerical_values"][0, 2], 7.3)
    assert np.isclose(out["numerical_values"][0, 3], 7.1)


def test_multiplet_state_roundtrip():
    prep = MultipletPreprocessor(encoding="numerical_encoding", normalise=True)
    prep.fit(MULTIPLETS)
    prep2 = MultipletPreprocessor.from_state(json.loads(json.dumps(prep.state_dict())))
    a, b = prep(MULTIPLETS), prep2(MULTIPLETS)
    assert (a["input_ids"] == b["input_ids"]).all()
    assert np.allclose(a["numerical_values"], b["numerical_values"])


CARBON = [
    [{"delta (ppm)": 128.34, "intensity": 1.0}, {"delta (ppm)": 77.1, "intensity": 2.0}],
    None,
    [{"delta (ppm)": 20.0, "intensity": 0.5}],
]


def test_carbon_preprocessor():
    prep = CarbonPreprocessor()
    prep.fit(CARBON)
    strings = prep.process_carbon(CARBON)
    assert strings[0] == "128.3 77.1"
    assert strings[1] == ""
    out = prep(CARBON)
    assert out["attention_mask"][1].sum() == 0


def test_carbon_intensities():
    prep = CarbonPreprocessor(intensities=True)
    prep.fit(CARBON)
    strings = prep.process_carbon(CARBON)
    assert strings[0] == "128.3 0.3 77.1 0.7"


MSMS = [
    [[100.0, 50.0], [120.5, 0.5], [150.2, 10.0]],
    [[90.1, 5.0]],
]


def test_msms_text():
    prep = MSMSTextPreprocessor()
    prep.fit(MSMS)
    strings = prep.process_msms(MSMS)
    assert strings[0] == "100.0 50.0 150.2 10.0"  # intensity<1 dropped
    out = prep(MSMS)
    assert out["input_ids"].shape[1] == prep.max_sequence_length


def test_msms_number():
    prep = MSMSNumberPreprocessor()
    prep.fit(MSMS)
    out = prep(MSMS)
    assert out["input_ids"].shape == (2, prep.max_peaks, 2)
    assert out["attention_mask"][0].sum() == 2  # 2 peaks above intensity 1
    assert out["attention_mask"][1].sum() == 1
    prep2 = MSMSNumberPreprocessor.from_state(json.loads(json.dumps(prep.state_dict())))
    assert np.allclose(prep2(MSMS)["input_ids"], out["input_ids"])


def _fake_spectra(n=8, length=600):
    rng = np.random.default_rng(0)
    return np.abs(rng.standard_normal((n, length))).tolist()


def test_text_spectrum_integer():
    prep = TextSpectrumPreprocessor(
        spectrum_tokens_x=50, spectrum_tokens_y=20, spectra_only=True
    )
    prep.fit(_fake_spectra())
    out = prep(_fake_spectra(2))
    assert out["input_ids"].shape == (2, prep.max_sequence_length)


def test_text_spectrum_with_formula():
    spectra = _fake_spectra(4)
    formulae = ["C6H12O6", "C2H6O", "CH4", "C10H8"]
    prep = TextSpectrumPreprocessor(spectrum_tokens_x=30, spectra_only=False)
    prep.fit(spectra, formulae)
    assert prep.process_formulae(["C6H12O6"]) == ["C6 H12 O6"]
    out = prep(spectra, formulae)
    assert out["input_ids"].shape[0] == 4


def test_text_spectrum_numerical_encoding():
    spectra = _fake_spectra(4)
    formulae = ["C6H12O6", "C2H6O", "CH4", "C10H8"]
    prep = TextSpectrumPreprocessor(
        spectrum_tokens_x=30, spectrum_to_text_y="numerical_encoding", spectra_only=False
    )
    prep.fit(spectra, formulae)
    out = prep(spectra, formulae)
    assert out["numerical_values"].shape == out["input_ids"].shape
    # formula + bos slots are 1.0
    assert out["numerical_values"][0, 0] == 1.0


def test_text_spectrum_frequency_bins_roundtrip():
    prep = TextSpectrumPreprocessor(
        spectrum_tokens_x=30, spectrum_to_text_y="frequency_based_clustering",
        spectra_only=True,
    )
    prep.fit(_fake_spectra())
    prep2 = TextSpectrumPreprocessor.from_state(json.loads(json.dumps(prep.state_dict())))
    a = prep(_fake_spectra(2))["input_ids"]
    b = prep2(_fake_spectra(2))["input_ids"]
    assert (a == b).all()


def test_run_length_encoding():
    assert RunLengthEncodingPreprocessor.get_run_length_encoding(["5 5 5 2 2 9"]) == [
        "5 3 2 2 9 1"
    ]
    prep = RunLengthEncodingPreprocessor(
        spectrum_tokens_x=50, spectrum_to_text_x="run_length_encoding", spectra_only=True
    )
    prep.fit(_fake_spectra())
    out = prep(_fake_spectra(2))
    assert out["input_ids"].shape[1] == prep.max_sequence_length


def test_normalise_preprocessor():
    prep = NormalisePreprocessor()
    data = np.random.default_rng(0).random((10, 4))
    prep.fit(data)
    normed = prep(data)
    assert np.allclose(prep.denormalise(normed), data)


def test_fit_and_artifact_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    config = {
        "Formula": {
            "type": "text", "column": "molecular_formula", "target": False,
            "preprocessor_arguments": {
                "tokenizer_regex": r"([A-Z]{1}[a-z]?[0-9]*)"
            },
        },
        "IR": {
            "type": "1D_patches", "column": "ir_spectra", "target": False,
            "preprocessor_arguments": {
                "patch_size": 100, "interpolation": False, "masking": False
            },
        },
        "Smiles": {
            "type": "text", "column": "smiles", "target": True,
            "preprocessor_arguments": {"tokenizer_regex": SMILES_REGEX},
        },
    }
    columns = {
        "Formula": ["C6H12O6", "C2H6O", "CH4"],
        "IR": rng.random((3, 400)).tolist(),
        "Smiles": ["CCO", "c1ccccc1", "CC(=O)O"],
    }
    config, preps = fit_preprocessors(columns, config)
    assert config["Smiles"]["vocab_size"] > 4
    assert config["Formula"]["pad_token_id"] == 0

    path = tmp_path / "preprocessor.json"
    save_preprocessors(path, config, preps)
    config2, preps2 = load_preprocessors_artifact(path)
    assert config2 == config
    a = preps["Smiles"](["CCO"], padding="max_length", max_length=8)["input_ids"]
    b = preps2["Smiles"](["CCO"], padding="max_length", max_length=8)["input_ids"]
    assert (a == b).all()
    pa, _ = preps["IR"](columns["IR"])
    pb, _ = preps2["IR"](columns["IR"])
    assert np.allclose(pa, pb)


def test_tokenizer_path_loading(tmp_path):
    """tokenizer_path reuses a pretrained tokenizer across dataset changes
    (reference data_utils.py:63-93)."""
    import json

    from multimodalanalytical_tpu.data.data_utils import load_tokenizer

    tok = build_regex_tokenizer(["CCO", "c1ccccc1", "CC(=O)O"], SMILES_REGEX)
    bare = tmp_path / "tok.json"
    with bare.open("w") as f:
        json.dump(tok.to_json(), f)

    # 1. bare tokenizer JSON
    loaded = load_tokenizer(bare, "Smiles")
    assert loaded.vocab == tok.vocab

    # 2. full preprocessor artifact
    config = {
        "Smiles": {
            "type": "text", "column": "smiles", "target": True,
            "preprocessor_arguments": {"tokenizer_regex": SMILES_REGEX},
        },
    }
    config, preps = fit_preprocessors(
        {"Smiles": ["CCO", "c1ccccc1", "CC(=O)O"]}, config
    )
    artifact = tmp_path / "preprocessor.json"
    save_preprocessors(artifact, config, preps)
    loaded2 = load_tokenizer(artifact, "Smiles")
    assert loaded2.vocab == preps["Smiles"].vocab

    # 3. through fit_preprocessors on a DIFFERENT dataset: vocab unchanged
    config3 = {
        "Smiles2": {
            "type": "text", "column": "smiles", "target": True,
            "preprocessor_arguments": {"tokenizer_path": str(bare)},
        },
    }
    config3, preps3 = fit_preprocessors({"Smiles2": ["NNN", "OOO"]}, config3)
    assert preps3["Smiles2"].vocab == tok.vocab
    assert config3["Smiles2"]["vocab_size"] == tok.vocab_size


def test_no_action_input_modality():
    """no_action encoder inputs pass raw feature vectors through collation
    and embedding (reference fits n_features, data_utils.py:118-124)."""
    import jax

    from multimodalanalytical_tpu.data.collator import MultiModalCollator
    from multimodalanalytical_tpu.models import ModelConfig, Seq2SeqModel

    config = {
        "Features": {
            "type": "no_action", "column": "feats", "target": False,
            "preprocessor_arguments": {},
        },
        "Smiles": {
            "type": "text", "column": "smiles", "target": True,
            "preprocessor_arguments": {"tokenizer_regex": SMILES_REGEX},
        },
    }
    columns = {
        "Features": [[0.5, 1.0, 0.0, 2.0]] * 3,
        "Smiles": ["CCO", "CCN", "CCS"],
    }
    config, preps = fit_preprocessors(columns, config)
    assert config["Features"]["n_features"] == 4

    collator = MultiModalCollator(preps, config)
    collator.fit_lengths(columns)
    batch = collator(columns)
    assert batch["encoder_inputs"]["Features"].shape == (3, 1, 4)
    assert batch["encoder_mask"].shape[1] >= 1

    cfg = ModelConfig(
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        vocab_size=config["Smiles"]["vocab_size"],
    )
    model = Seq2SeqModel(config=cfg, data_config=config,
                         target_modality="Smiles")
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    out = model.apply(
        {"params": variables["params"]},
        batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    assert np.isfinite(float(out["loss"]))
