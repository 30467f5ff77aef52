"""Model-forward numerical parity against the REFERENCE's executed code.

``tests/golden/reference_model_goldens.npz`` holds torch state_dicts,
inputs, and fp32 logits/losses produced by running the reference's
``CustomModel`` (/root/reference/src/analytical_fm/modeling/
custom_modeling.py:323-508) + ``MultimodalEmbedding`` (modeling/
utils.py:44-182) on five presets spanning pre/post-LN x GEGLU x align
(conv/mlp/sid) x sin_cos/learned positions x patch-MLP depths x XVal.
Regenerate with ``python tests/golden/make_reference_model_goldens.py``.

Here the SAME weights are loaded into our Flax ``Seq2SeqModel`` via an
explicit torch->flax mapping and the fp32 logits/losses must match. This
closes the one parity layer that previously rested on re-implementation
alone (VERDICT round 2, item 2): pre/post-LN order, GEGLU, interleaved
sincos, learned-position LN, per-modality embedding LN, XVal scaling,
masked-mean align pooling, CE(-100) and align-loss arithmetic are all
pinned to the reference's executed forward.

Known deliberate deviations NOT exercised here (docs/index.md):
  * peak-index positions reaching the pos-enc (reference ignores them);
  * torch's Embedding padding_idx freezes the pad row during TRAINING
    (gradient-level; forward is identical with copied weights).
(The LayerNorm eps mismatch this test originally found — flax default 1e-6
vs torch 1e-5, ~5e-4 on post-LN fp32 logits — was FIXED by pinning
eps=1e-5 everywhere; see transformer.py _norm.)
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "reference_model_goldens.npz"

BATCH = 3
FORMULA_LEN = 5
N_PATCHES = 4
PATCH = 16
TARGET_LEN = 7
D_MODEL = 32
VOCAB = 50

CASES = {
    "preln_geglu_alignconv_sincos": dict(
        post_layer_normalisation=True, gated_linear=True,
        positional_encoding_type="sin_cos",
        align=dict(align_network="convolutional", hidden_dimension=16,
                   conv_channels=8, kernel_size=5, output_dimension=24,
                   loss_lambda=3.0, loss_function="mse"),
    ),
    "preln_plain_sincos": dict(
        post_layer_normalisation=True, gated_linear=False,
        positional_encoding_type="sin_cos", align=None,
    ),
    "postln_geglu_alignmlp_learned": dict(
        post_layer_normalisation=False, gated_linear=True,
        positional_encoding_type="learned",
        align=dict(align_network="mlp", hidden_dimension=16,
                   conv_channels=8, kernel_size=5, output_dimension=24,
                   loss_lambda=0.5, loss_function="mae"),
        patch_encoding="linear_2_layer",
    ),
    "postln_plain_xval_learned": dict(
        post_layer_normalisation=False, gated_linear=False,
        positional_encoding_type="learned", align=None,
        patch_encoding="linear_3_layer", xval=True,
    ),
    "preln_geglu_alignsid_sincos": dict(
        post_layer_normalisation=True, gated_linear=True,
        positional_encoding_type="sin_cos",
        align=dict(align_network="mlp", hidden_dimension=16,
                   conv_channels=8, kernel_size=5, output_dimension=24,
                   loss_lambda=1.0, loss_function="sid"),
    ),
}


def build_data_config(case):
    data_config = {
        "Formula": {
            "type": "text", "column": "molecular_formula", "target": False,
            "vocab_size": 32, "pad_token_id": 0,
            "preprocessor_arguments": {},
        },
        "IR": {
            "type": "1D_patches", "column": "ir", "target": False,
            "preprocessor_arguments": {"patch_size": PATCH},
        },
        "Smiles": {
            "type": "text", "column": "smiles", "target": True,
            "vocab_size": VOCAB, "pad_token_id": 0,
            "preprocessor_arguments": {},
        },
    }
    if case.get("patch_encoding"):
        data_config["IR"]["preprocessor_arguments"]["encoding_type"] = (
            case["patch_encoding"])
    if case.get("xval"):
        data_config["Multiplets"] = {
            "type": "multiplets", "column": "multiplets", "target": False,
            "vocab_size": 20, "pad_token_id": 0,
            "preprocessor_arguments": {},
        }
    return data_config


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), (
        "missing committed golden; regenerate with "
        "tests/golden/make_reference_model_goldens.py"
    )
    return np.load(GOLDEN, allow_pickle=False)


# The torch->flax weight mapping lives in models/torch_mapping.py (shared
# with scripts/convert_reference_checkpoint.py); the tests below are the
# numerical proof it is correct. Architecture knobs (layer count, GEGLU,
# align head, learned positions, embedding layer types) are INFERRED from
# the state_dict keys — the explicit per-case mapping this file originally
# carried is subsumed.
from multimodalanalytical_tpu.models.torch_mapping import (  # noqa: E402
    bart_to_flax,
    custom_model_to_flax,
    t5_to_flax,
)


def _case_arrays(golden, name):
    prefix = name + "/"
    g = {k[len(prefix) + len("param/"):]: golden[k]
         for k in golden.files if k.startswith(prefix + "param/")}
    ins = {k[len(prefix) + len("in/"):]: golden[k]
           for k in golden.files if k.startswith(prefix + "in/")}
    outs = {k[len(prefix) + len("out/"):]: golden[k]
            for k in golden.files if k.startswith(prefix + "out/")}
    return g, ins, outs


def _build_model(case, data_config):
    from multimodalanalytical_tpu.models import ModelConfig, Seq2SeqModel
    from multimodalanalytical_tpu.models.config import AlignConfig

    align = AlignConfig(**case["align"]) if case.get("align") else None
    cfg = ModelConfig(
        d_model=D_MODEL, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, dropout=0.1,
        post_layer_normalisation=case["post_layer_normalisation"],
        gated_linear=case["gated_linear"],
        positional_encoding_type=case["positional_encoding_type"],
        max_position_embeddings=64, vocab_size=VOCAB, align_config=align,
    )
    return Seq2SeqModel(config=cfg, data_config=data_config,
                        target_modality="Smiles")


@pytest.mark.parametrize("name", list(CASES))
def test_forward_matches_reference(golden, name):
    case = CASES[name]
    data_config = build_data_config(case)
    g, ins, outs = _case_arrays(golden, name)
    model = _build_model(case, data_config)
    params = custom_model_to_flax(g)

    enc_inputs = {
        "Formula": ins["Formula"].astype(np.int32),
        "IR": ins["IR"].astype(np.float32),
    }
    if case.get("xval"):
        enc_inputs["Multiplets"] = {
            "tokenized_input": ins["Multiplets.tokenized_input"].astype(np.int32),
            "numerical_values": ins["Multiplets.numerical_values"].astype(np.float32),
        }
    res = model.apply(
        {"params": params},
        enc_inputs,
        ins["enc_mask"].astype(np.int32),
        ins["dec_ids"].astype(np.int32),
        ins["dec_mask"].astype(np.int32),
        ins["labels"].astype(np.int32),
        align_target=(ins["align_target"].astype(np.float32)
                      if case.get("align") else None),
        deterministic=True,
    )

    np.testing.assert_allclose(
        np.asarray(res["logits"], np.float64), outs["logits"],
        rtol=2e-4, atol=2e-5,
        err_msg=f"{name}: logits diverge from the executed reference",
    )
    np.testing.assert_allclose(
        float(res["model_only_loss"]), float(outs["model_only_loss"]),
        rtol=1e-5, atol=1e-6, err_msg=f"{name}: CE loss diverges",
    )
    if case.get("align"):
        np.testing.assert_allclose(
            float(res["alignment_loss"]), float(outs["alignment_loss"]),
            rtol=1e-4, atol=1e-6, err_msg=f"{name}: align loss diverges",
        )
    np.testing.assert_allclose(
        float(res["loss"]), float(outs["loss"]),
        rtol=1e-5, atol=1e-5, err_msg=f"{name}: total loss diverges",
    )


def test_sincos_table_matches_reference_buffer(golden):
    """The interleaved sincos table must equal the reference's registered
    buffer bit-for-bit (up to fp32 rounding)."""
    from multimodalanalytical_tpu.ops.positional import sincos_table

    buf = golden["preln_plain_sincos/param/"
                 "embedding.positional_encodings.pos_enc"]
    ours = np.asarray(sincos_table(buf.shape[0], buf.shape[1]))
    # fp32 rounding only: torch builds the table via 10000**x then divide,
    # ours via exp/negation — identical math, last-ulp differences.
    np.testing.assert_allclose(ours, buf, rtol=2e-5, atol=4e-6)


# ---------------------------------------------------------------------------
# Executed HF graphs (reference wrapper.py:32-84 BART, :182-219 T5)
# ---------------------------------------------------------------------------

HF_CASES = {
    "bart_executed_graph": ("BartForConditionalGeneration", bart_to_flax),
    "t5_executed_graph": ("T5ForConditionalGeneration", t5_to_flax),
}


@pytest.mark.parametrize("name", list(HF_CASES))
def test_hf_graph_matches_executed_reference(golden, name):
    """Our BART/T5 presets must reproduce the HF graphs the reference
    ACTUALLY executes — including the reference's embedding/position
    surgery (wrapper.py:64-84, :203-218), HF BART's decoder
    layernorm_embedding + missing final stack norms, and T5's
    unscaled/bias-free attention with the tied-embedding d**-0.5 logits
    scaling that survives the broken weight tie."""
    from multimodalanalytical_tpu.models import Seq2SeqModel
    from multimodalanalytical_tpu.models.config import resolve_model_config

    model_type, mapper = HF_CASES[name]
    data_config = build_data_config({})
    g, ins, outs = _case_arrays(golden, name)
    cfg = resolve_model_config(
        {
            "model_type": model_type, "d_model": D_MODEL,
            "encoder_layers": 2, "decoder_layers": 2,
            "encoder_attention_heads": 4, "decoder_attention_heads": 4,
            "encoder_ffn_dim": 64, "decoder_ffn_dim": 64, "dropout": 0.1,
            "max_position_embeddings": 64,
        },
        vocab_size=VOCAB, pad_token_id=0, bos_token_id=2, eos_token_id=3,
    )
    model = Seq2SeqModel(config=cfg, data_config=data_config,
                         target_modality="Smiles")
    params = mapper(g)

    enc_inputs = {
        "Formula": ins["Formula"].astype(np.int32),
        "IR": ins["IR"].astype(np.float32),
    }
    res = model.apply(
        {"params": params},
        enc_inputs,
        ins["enc_mask"].astype(np.int32),
        ins["dec_ids"].astype(np.int32),
        ins["dec_mask"].astype(np.int32),
        ins["labels"].astype(np.int32),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(res["logits"], np.float64), outs["logits"],
        rtol=2e-4, atol=2e-5,
        err_msg=f"{name}: logits diverge from the executed HF reference graph",
    )
    np.testing.assert_allclose(
        float(res["loss"]), float(outs["loss"]), rtol=1e-5, atol=1e-6,
        err_msg=f"{name}: loss diverges",
    )
