"""Generate model-forward parity goldens from the REFERENCE's executed code.

Builds the reference's torch ``CustomModel`` (+ its ``MultimodalEmbedding``,
/root/reference/src/analytical_fm/modeling/custom_modeling.py:323-508 and
modeling/utils.py:44-182) for four presets spanning {pre/post-LN} x {GEGLU}
x {align conv/mlp/none} x {sin_cos/learned positions} x {patch-MLP depths}
x {XVal}, runs one fp32 forward+loss on fixed synthetic inputs, and writes
the torch state_dict + inputs + outputs to ``reference_model_goldens.npz``.

``tests/test_reference_model_parity.py`` loads those weights into our Flax
``Seq2SeqModel`` and asserts logits/losses match.

Notes on the executed path:
  * model.eval() + torch.no_grad() (dropout off), fp32 end to end;
  * torch's fused MHA "fastpath" is disabled so the canonical math path
    (the one training always uses — dropout>0 disables the fastpath) is
    what gets pinned;
  * CrossEntropyLoss default ignore_index=-100 is exercised via padded
    labels.

Usage: python tests/golden/make_reference_model_goldens.py
"""

import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, "/root/reference/src")

import torch  # noqa: E402

torch.manual_seed(0)
torch.backends.mha.set_fastpath_enabled(False)

from analytical_fm.modeling.custom_modeling import (  # noqa: E402
    AlignConfig, CustomConfig, CustomModel,
)
from analytical_fm.modeling.utils import MultimodalEmbedding  # noqa: E402


class _Tok:
    vocab_size = 50
    pad_token_id = 0
    bos_token_id = 2
    eos_token_id = 3


BATCH = 3
FORMULA_LEN = 5
N_PATCHES = 4
PATCH = 16
TARGET_LEN = 7
D_MODEL = 32
VOCAB = 50

CASES = {
    # name: (config kwargs, data_config extras, align)
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


def build_inputs(case, rng):
    formula = rng.integers(4, 32, (BATCH, FORMULA_LEN)).astype(np.int64)
    formula[:, -1] = 0  # pad tail
    ir = rng.random((BATCH, N_PATCHES, PATCH)).astype(np.float32)
    enc_len = FORMULA_LEN + N_PATCHES
    inputs = {"Formula": formula, "IR": ir}
    if case.get("xval"):
        mult_ids = rng.integers(4, 20, (BATCH, 6)).astype(np.int64)
        mult_vals = rng.normal(size=(BATCH, 6)).astype(np.float32)
        inputs["Multiplets"] = {
            "tokenized_input": mult_ids, "numerical_values": mult_vals,
        }
        enc_len += 6
    enc_mask = np.ones((BATCH, enc_len), np.int64)
    enc_mask[:, FORMULA_LEN - 1] = 0          # padded formula token
    enc_mask[0, -1] = 0                       # one more pad in row 0
    dec_ids = rng.integers(4, VOCAB, (BATCH, TARGET_LEN)).astype(np.int64)
    dec_ids[:, 0] = 2                         # bos
    dec_mask = np.ones((BATCH, TARGET_LEN), np.int64)
    dec_mask[:, -2:] = 0
    labels = np.roll(dec_ids, -1, axis=1).astype(np.int64)
    labels[dec_mask == 0] = -100
    labels[:, -1] = -100
    align_target = rng.random((BATCH, 24)).astype(np.float32) * 0.9 + 0.05
    return inputs, enc_mask, dec_ids, dec_mask, labels, align_target


def main():
    out = {}
    for name, case in CASES.items():
        rng = np.random.default_rng(42)
        data_config = build_data_config(case)
        align = AlignConfig(**case["align"]) if case.get("align") else None
        config = CustomConfig(
            d_model=D_MODEL, encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=4, decoder_attention_heads=4,
            encoder_ffn_dim=64, decoder_ffn_dim=64, dropout=0.1,
            activation_function="gelu",
            post_layer_normalisation=case["post_layer_normalisation"],
            gated_linear=case["gated_linear"],
            positional_encoding_type=case["positional_encoding_type"],
            max_position_embeddings=64,
            vocab_size=VOCAB, align_config=align,
        )
        embedding = MultimodalEmbedding(
            data_config, D_MODEL, embedding_norm=True,
            do_positional_encodings=True,
            positional_encodings_type=case["positional_encoding_type"],
            max_seq_len=64,
        )
        model = CustomModel("Smiles", _Tok(), config, embedding)
        model.eval()

        inputs, enc_mask, dec_ids, dec_mask, labels, align_target = (
            build_inputs(case, rng))
        torch_inputs = {
            k: ({kk: torch.tensor(vv) for kk, vv in v.items()}
                if isinstance(v, dict) else torch.tensor(v))
            for k, v in inputs.items()
        }
        with torch.no_grad():
            inputs_embeds = embedding(torch_inputs)
            res = model(
                inputs_embeds=inputs_embeds,
                attention_mask=torch.tensor(enc_mask),
                decoder_input_ids=torch.tensor(dec_ids),
                decoder_attention_mask=torch.tensor(dec_mask),
                labels=torch.tensor(labels),
                encoder_align_target=torch.tensor(align_target),
            )

        prefix = f"{name}/"
        for pname, tensor in model.state_dict().items():
            out[prefix + "param/" + pname] = tensor.detach().numpy()
        for k, v in inputs.items():
            if isinstance(v, dict):
                for kk, vv in v.items():
                    out[prefix + f"in/{k}.{kk}"] = vv
            else:
                out[prefix + f"in/{k}"] = v
        out[prefix + "in/enc_mask"] = enc_mask
        out[prefix + "in/dec_ids"] = dec_ids
        out[prefix + "in/dec_mask"] = dec_mask
        out[prefix + "in/labels"] = labels
        out[prefix + "in/align_target"] = align_target
        out[prefix + "out/logits"] = res.logits.numpy()
        out[prefix + "out/loss"] = np.float64(res.loss.item())
        out[prefix + "out/model_only_loss"] = np.float64(
            res.loss_dict["model_only_loss"].item())
        align_loss = res.loss_dict["alignment_loss"]
        out[prefix + "out/alignment_loss"] = np.float64(
            align_loss.item() if align_loss is not None else 0.0)
        print(name, "loss", res.loss.item())

    np.savez_compressed(HERE / "reference_model_goldens.npz", **out)
    print("wrote", HERE / "reference_model_goldens.npz", len(out), "arrays")


if __name__ == "__main__":
    main()
