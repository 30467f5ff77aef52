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


def _t(w):
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _ln(g, name):
    return {"scale": g[name + ".weight"], "bias": g[name + ".bias"]}


def _mha_self(g, name):
    w, b = g[name + ".in_proj_weight"], g[name + ".in_proj_bias"]
    return {
        "qkv_proj": {"kernel": _t(w), "bias": b},
        "out_proj": {"kernel": _t(g[name + ".out_proj.weight"]),
                     "bias": g[name + ".out_proj.bias"]},
    }


def _mha_cross(g, name):
    w, b = g[name + ".in_proj_weight"], g[name + ".in_proj_bias"]
    d = w.shape[1]
    return {
        "q_proj": {"kernel": _t(w[:d]), "bias": b[:d]},
        "kv_proj": {"kernel": _t(w[d:]), "bias": b[d:]},
        "out_proj": {"kernel": _t(g[name + ".out_proj.weight"]),
                     "bias": g[name + ".out_proj.bias"]},
    }


def _ff(g, name, gated):
    ff = {
        "linear1": {"kernel": _t(g[name + ".linear1.weight"]),
                    "bias": g[name + ".linear1.bias"]},
        "linear2": {"kernel": _t(g[name + ".linear2.weight"]),
                    "bias": g[name + ".linear2.bias"]},
    }
    if gated:
        ff["gate"] = {"kernel": _t(g[name + ".gate.weight"]),
                      "bias": g[name + ".gate.bias"]}
    return ff


def _embedding_params(g, case, data_config):
    out = {}
    for modality, mcfg in data_config.items():
        base = f"embedding.embedding_layer_dict.{modality}"
        if mcfg["type"] in ("text", "multiplets"):
            out[f"embed_{modality}"] = {"embedding": g[base + ".weight"]}
        else:  # 1D_patches
            enc = mcfg["preprocessor_arguments"].get("encoding_type", "linear")
            if enc == "linear":
                out[f"embed_{modality}"] = {"proj": {
                    "kernel": _t(g[base + ".weight"]),
                    "bias": g[base + ".bias"]}}
            else:
                n = 2 if enc == "linear_2_layer" else 3
                out[f"embed_{modality}"] = {
                    f"proj_{i}": {"kernel": _t(g[f"{base}.{2 * i}.weight"]),
                                  "bias": g[f"{base}.{2 * i}.bias"]}
                    for i in range(n)
                }
        out[f"norm_{modality}"] = _ln(g, f"embedding.embedding_norm_dict.{modality}")
    if case["positional_encoding_type"] == "learned":
        out["pos_enc"] = {
            "pos_embed": {
                "embedding": g["embedding.positional_encodings.pos_encodings.weight"]},
            "pos_norm": _ln(g, "embedding.positional_encodings.norm"),
        }
    return out


def _align_params(g, case):
    a = case["align"]
    if a["align_network"] == "mlp":
        return {
            "fc1": {"kernel": _t(g["align_network.0.weight"]),
                    "bias": g["align_network.0.bias"]},
            "fc2": {"kernel": _t(g["align_network.2.weight"]),
                    "bias": g["align_network.2.bias"]},
        }
    # convolutional: Sequential(Linear, ReLU, Linear, Lambda, Conv1d, ReLU,
    # Conv1d, Sigmoid, Lambda) -> fc1, fc2, conv1 (spatial), conv2 (1x1 ==
    # Dense).
    conv1_w = g["align_network.4.weight"]          # (out_ch, in_ch, k)
    conv2_w = g["align_network.6.weight"]          # (out, in, 1)
    return {
        "fc1": {"kernel": _t(g["align_network.0.weight"]),
                "bias": g["align_network.0.bias"]},
        "fc2": {"kernel": _t(g["align_network.2.weight"]),
                "bias": g["align_network.2.bias"]},
        "conv1": {"kernel": np.ascontiguousarray(conv1_w.transpose(2, 1, 0)),
                  "bias": g["align_network.4.bias"]},
        "conv2": {"kernel": _t(conv2_w[:, :, 0]),
                  "bias": g["align_network.6.bias"]},
    }


def torch_to_flax(g, case, data_config, n_layers=2):
    params = {
        "embedding": _embedding_params(g, case, data_config),
        "encoder": {"final_norm": _ln(g, "encoder.norm")},
        "decoder": {"final_norm": _ln(g, "decoder.norm")},
        "lm_head": {"kernel": _t(g["token_ff.weight"]),
                    "bias": g["token_ff.bias"]},
    }
    for i in range(n_layers):
        params["encoder"][f"layer_{i}"] = {
            "self_attn": _mha_self(g, f"encoder.layers.{i}.self_attn"),
            "ff": _ff(g, f"encoder.layers.{i}", case["gated_linear"]),
            "norm1": _ln(g, f"encoder.layers.{i}.norm1"),
            "norm2": _ln(g, f"encoder.layers.{i}.norm2"),
        }
        params["decoder"][f"layer_{i}"] = {
            "self_attn": _mha_self(g, f"decoder.layers.{i}.self_attn"),
            "cross_attn": _mha_cross(g, f"decoder.layers.{i}.multihead_attn"),
            "ff": _ff(g, f"decoder.layers.{i}", case["gated_linear"]),
            "norm1": _ln(g, f"decoder.layers.{i}.norm1"),
            "norm2": _ln(g, f"decoder.layers.{i}.norm2"),
            "norm3": _ln(g, f"decoder.layers.{i}.norm3"),
        }
    if case.get("align"):
        params["align_network"] = _align_params(g, case)
    return params


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
    params = torch_to_flax(g, case, data_config)

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

def _dense(g, name, bias=True):
    out = {"kernel": _t(g[name + ".weight"])}
    if bias:
        out["bias"] = g[name + ".bias"]
    return out


def _hf_fused_self(g, base, bias=True):
    """HF separate q/k/v/out projections -> our fused qkv layout."""
    kernel = np.concatenate(
        [_t(g[f"{base}.{p}.weight"]) for p in ("q", "k", "v")], axis=1)
    out = {"qkv_proj": {"kernel": kernel},
           "out_proj": {"kernel": _t(g[f"{base}.o.weight"])}}
    if bias:
        out["qkv_proj"]["bias"] = np.concatenate(
            [g[f"{base}.{p}.bias"] for p in ("q", "k", "v")])
        out["out_proj"]["bias"] = g[f"{base}.o.bias"]
    return out


def _hf_cross(g, base, bias=True):
    out = {
        "q_proj": {"kernel": _t(g[f"{base}.q.weight"])},
        "kv_proj": {"kernel": np.concatenate(
            [_t(g[f"{base}.k.weight"]), _t(g[f"{base}.v.weight"])], axis=1)},
        "out_proj": {"kernel": _t(g[f"{base}.o.weight"])},
    }
    if bias:
        out["q_proj"]["bias"] = g[f"{base}.q.bias"]
        out["kv_proj"]["bias"] = np.concatenate(
            [g[f"{base}.k.bias"], g[f"{base}.v.bias"]])
        out["out_proj"]["bias"] = g[f"{base}.o.bias"]
    return out


def _shared_embedding_params(g, prefix):
    emb = {}
    for mod in ("Formula", "IR", "Smiles"):
        base = f"{prefix}.embedding_layer_dict.{mod}"
        if mod == "IR":
            emb["embed_IR"] = {"proj": {"kernel": _t(g[base + ".weight"]),
                                        "bias": g[base + ".bias"]}}
        else:
            emb[f"embed_{mod}"] = {"embedding": g[base + ".weight"]}
        emb[f"norm_{mod}"] = _ln(g, f"{prefix}.embedding_norm_dict.{mod}")
    return emb


def _rename_hf_bart(g):
    """HF Bart names its projections q_proj/k_proj/v_proj/out_proj and its
    FFN fc1/fc2; normalize to the short q/k/v/o names the helpers use."""
    ren = {}
    for k, v in g.items():
        k = (k.replace(".q_proj.", ".q.").replace(".k_proj.", ".k.")
              .replace(".v_proj.", ".v.").replace(".out_proj.", ".o."))
        ren[k] = v
    return ren


def bart_torch_to_flax(g, n_layers=2):
    g = _rename_hf_bart(g)
    params = {
        "embedding": _shared_embedding_params(g, "model.shared"),
        "decoder_emb_norm": _ln(g, "model.decoder.layernorm_embedding"),
        "lm_head": {"kernel": _t(g["lm_head.weight"])},
        "encoder": {}, "decoder": {},
    }
    for i in range(n_layers):
        e = f"model.encoder.layers.{i}"
        params["encoder"][f"layer_{i}"] = {
            "self_attn": _hf_fused_self(g, f"{e}.self_attn"),
            "ff": {"linear1": _dense(g, f"{e}.fc1"),
                   "linear2": _dense(g, f"{e}.fc2")},
            "norm1": _ln(g, f"{e}.self_attn_layer_norm"),
            "norm2": _ln(g, f"{e}.final_layer_norm"),
        }
        d = f"model.decoder.layers.{i}"
        params["decoder"][f"layer_{i}"] = {
            "self_attn": _hf_fused_self(g, f"{d}.self_attn"),
            "cross_attn": _hf_cross(g, f"{d}.encoder_attn"),
            "ff": {"linear1": _dense(g, f"{d}.fc1"),
                   "linear2": _dense(g, f"{d}.fc2")},
            "norm1": _ln(g, f"{d}.self_attn_layer_norm"),
            "norm2": _ln(g, f"{d}.encoder_attn_layer_norm"),
            "norm3": _ln(g, f"{d}.final_layer_norm"),
        }
    return params


def t5_torch_to_flax(g, n_layers=2):
    params = {
        "embedding": _shared_embedding_params(g, "shared"),
        "lm_head": {"kernel": _t(g["lm_head.weight"])},
        "encoder": {
            "final_norm": {"scale": g["encoder.final_layer_norm.weight"]},
            "rel_bias": {"rel_bias": {"embedding": g[
                "encoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight"]}},
        },
        "decoder": {
            "final_norm": {"scale": g["decoder.final_layer_norm.weight"]},
            "rel_bias": {"rel_bias": {"embedding": g[
                "decoder.block.0.layer.0.SelfAttention"
                ".relative_attention_bias.weight"]}},
        },
    }
    for i in range(n_layers):
        e = f"encoder.block.{i}"
        params["encoder"][f"layer_{i}"] = {
            "self_attn": _hf_fused_self(g, f"{e}.layer.0.SelfAttention",
                                        bias=False),
            "ff": {"linear1": _dense(g, f"{e}.layer.1.DenseReluDense.wi",
                                     bias=False),
                   "linear2": _dense(g, f"{e}.layer.1.DenseReluDense.wo",
                                     bias=False)},
            "norm1": {"scale": g[f"{e}.layer.0.layer_norm.weight"]},
            "norm2": {"scale": g[f"{e}.layer.1.layer_norm.weight"]},
        }
        d = f"decoder.block.{i}"
        params["decoder"][f"layer_{i}"] = {
            "self_attn": _hf_fused_self(g, f"{d}.layer.0.SelfAttention",
                                        bias=False),
            "cross_attn": _hf_cross(g, f"{d}.layer.1.EncDecAttention",
                                    bias=False),
            "ff": {"linear1": _dense(g, f"{d}.layer.2.DenseReluDense.wi",
                                     bias=False),
                   "linear2": _dense(g, f"{d}.layer.2.DenseReluDense.wo",
                                     bias=False)},
            "norm1": {"scale": g[f"{d}.layer.0.layer_norm.weight"]},
            "norm2": {"scale": g[f"{d}.layer.1.layer_norm.weight"]},
            "norm3": {"scale": g[f"{d}.layer.2.layer_norm.weight"]},
        }
    return params


HF_CASES = {
    "bart_executed_graph": ("BartForConditionalGeneration", bart_torch_to_flax),
    "t5_executed_graph": ("T5ForConditionalGeneration", t5_torch_to_flax),
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
