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


def _xavier_init_all(model):
    """HFWrapper._init_params (reference wrapper.py:321-327): xavier-uniform
    every parameter with dim > 1 — the reference applies this to the WHOLE
    wrapper after construction, so HF's own init never survives."""
    for p in model.parameters():
        if p.dim() > 1:
            torch.nn.init.xavier_uniform_(p)


def _save_case(out, name, model, inputs, enc_mask, dec_ids,
               dec_mask, labels, logits, loss,
               extra_inputs=None, extra_outputs=None):
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
    for k, v in (extra_inputs or {}).items():
        out[prefix + f"in/{k}"] = v
    out[prefix + "out/logits"] = logits
    out[prefix + "out/loss"] = np.float64(loss)
    for k, v in (extra_outputs or {}).items():
        out[prefix + f"out/{k}"] = v


def add_hf_bart(out):
    """The BART graph the reference ACTUALLY executes: HF
    BartForConditionalGeneration built from config (wrapper.py:51-62) with
    the reference's surgery applied verbatim (wrapper.py:64-84): shared /
    encoder embeddings -> MultimodalEmbedding, decoder embedding -> the RAW
    target embedding table, encoder layernorm_embedding -> DummyLayer
    (multimodal_norm=True), both embed_positions -> the reference's
    SincCosPositionalEncoding. Forward through HFWrapper.forward's exact
    call (wrapper.py:392-407: inputs_embeds from the multimodal embedding,
    HF handles positions/decoder internally)."""
    from transformers import BartConfig, BartForConditionalGeneration

    from analytical_fm.modeling.utils import (
        DummyLayer, SincCosPositionalEncoding,
    )

    rng = np.random.default_rng(42)
    data_config = build_data_config({})
    cfg = BartConfig(
        vocab_size=VOCAB, pad_token_id=0, bos_token_id=2, eos_token_id=3,
        decoder_start_token_id=2, forced_eos_token_id=3,
        d_model=D_MODEL, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, dropout=0.1,
        activation_function="gelu", max_position_embeddings=64,
        scale_embedding=False,
    )
    model = BartForConditionalGeneration(cfg)
    embedding = MultimodalEmbedding(data_config, D_MODEL, True)
    # --- surgery, wrapper.py:64-82 ---
    model.model.shared = embedding
    model.model.encoder.embed_tokens = embedding
    model.model.decoder.embed_tokens = embedding.embedding_layer_dict["Smiles"]
    model.model.encoder.layernorm_embedding = DummyLayer()

    # transformers 4.57 calls embed_positions(input, past_kv_len,
    # position_ids=...); the reference's module (written for the older HF
    # API) accepts only positional extras (forward(inputs, *args)). Shim the
    # call signature ONLY — the module itself, and therefore the math, is
    # the reference's: it ignores every extra argument and always returns
    # rows [0..L) of its sincos buffer.
    class _PosShim(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, inputs, *args, **kwargs):
            return self.inner(inputs, *args)

    pos = _PosShim(SincCosPositionalEncoding(D_MODEL))
    model.model.encoder.embed_positions = pos
    model.model.decoder.embed_positions = pos
    _xavier_init_all(model)
    model.eval()

    inputs, enc_mask, dec_ids, dec_mask, labels, _ = build_inputs({}, rng)
    with torch.no_grad():
        embeds = embedding({k: torch.tensor(v) for k, v in inputs.items()})
        res = model(
            inputs_embeds=embeds,
            attention_mask=torch.tensor(enc_mask),
            decoder_input_ids=torch.tensor(dec_ids),
            decoder_attention_mask=torch.tensor(dec_mask),
            labels=torch.tensor(labels),
        )
    _save_case(out, "bart_executed_graph", model, inputs,
               enc_mask, dec_ids, dec_mask, labels,
               res.logits.numpy(), res.loss.item())
    print("bart_executed_graph loss", res.loss.item())


def add_hf_t5(out):
    """The T5 graph the reference executes: HF T5ForConditionalGeneration
    from config (wrapper.py:192-200) with the surgery of wrapper.py:203-218
    — shared/encoder embeddings -> MultimodalEmbedding; decoder embedding ->
    Sequential(target embedding, target norm) (multimodal_norm=True). Note
    tie_word_embeddings stays True in the config, so HF still applies the
    d_model**-0.5 decoder-output scaling even though the embedding surgery
    broke the actual weight tie."""
    from transformers import T5Config, T5ForConditionalGeneration

    rng = np.random.default_rng(42)
    data_config = build_data_config({})
    cfg = T5Config(
        vocab_size=VOCAB, pad_token_id=0, eos_token_id=3,
        decoder_start_token_id=2, d_model=D_MODEL, d_kv=D_MODEL // 4,
        d_ff=64, num_layers=2, num_heads=4, dropout_rate=0.1,
        relative_attention_num_buckets=32, relative_attention_max_distance=128,
    )
    model = T5ForConditionalGeneration(cfg)
    embedding = MultimodalEmbedding(data_config, D_MODEL, True)
    # --- surgery, wrapper.py:203-218 ---
    model.shared = embedding
    model.encoder.set_input_embeddings(embedding)
    target_embedding = torch.nn.Sequential(
        embedding.embedding_layer_dict["Smiles"],
        embedding.embedding_norm_dict["Smiles"],
    )
    model.decoder.set_input_embeddings(target_embedding)
    _xavier_init_all(model)
    model.eval()

    inputs, enc_mask, dec_ids, dec_mask, labels, _ = build_inputs({}, rng)
    with torch.no_grad():
        embeds = embedding({k: torch.tensor(v) for k, v in inputs.items()})
        res = model(
            inputs_embeds=embeds,
            attention_mask=torch.tensor(enc_mask),
            decoder_input_ids=torch.tensor(dec_ids),
            decoder_attention_mask=torch.tensor(dec_mask),
            labels=torch.tensor(labels),
        )
    _save_case(out, "t5_executed_graph", model, inputs,
               enc_mask, dec_ids, dec_mask, labels,
               res.logits.numpy(), res.loss.item())
    print("t5_executed_graph loss", res.loss.item())


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

        align_loss = res.loss_dict["alignment_loss"]
        _save_case(
            out, name, model, inputs, enc_mask, dec_ids, dec_mask, labels,
            res.logits.numpy(), res.loss.item(),
            extra_inputs={"align_target": align_target},
            extra_outputs={
                "model_only_loss": np.float64(
                    res.loss_dict["model_only_loss"].item()),
                "alignment_loss": np.float64(
                    align_loss.item() if align_loss is not None else 0.0),
            },
        )
        print(name, "loss", res.loss.item())

    add_hf_bart(out)
    add_hf_t5(out)
    np.savez_compressed(HERE / "reference_model_goldens.npz", **out)
    print("wrote", HERE / "reference_model_goldens.npz", len(out), "arrays")


if __name__ == "__main__":
    main()
