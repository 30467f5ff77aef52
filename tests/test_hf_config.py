"""HF-config-driven architecture derivation for the BART/T5 model types.

The reference sources every dimension of its HF model types from
``AutoConfig.from_pretrained(model_name, **kwargs)`` (reference
wrapper.py:32-60 bart, :183-199 t5), with YAML kwargs overriding on top.
This pins our equivalent: ``hf_architecture_kwargs`` (offline table, real
``transformers`` config objects, local paths) and the ``model_name`` branch
of ``resolve_model_config``.
"""

import pytest

from multimodalanalytical_tpu.models.config import (
    hf_architecture_kwargs,
    resolve_model_config,
)


def test_t5_small_offline_matches_upstream_config():
    kw = hf_architecture_kwargs("google-t5/t5-small")
    assert kw == {
        "d_model": 512, "encoder_layers": 6, "decoder_layers": 6,
        "encoder_attention_heads": 8, "decoder_attention_heads": 8,
        "encoder_ffn_dim": 2048, "decoder_ffn_dim": 2048,
        "dropout": 0.1, "activation_function": "relu", "gated_linear": False,
    }
    assert hf_architecture_kwargs("t5-small") == kw  # hub alias


def test_bart_base_offline_matches_upstream_config():
    kw = hf_architecture_kwargs("facebook/bart-base")
    assert kw["d_model"] == 768
    assert kw["encoder_attention_heads"] == kw["decoder_attention_heads"] == 12
    assert kw["encoder_ffn_dim"] == kw["decoder_ffn_dim"] == 3072
    assert (kw["encoder_layers"], kw["decoder_layers"]) == (6, 6)
    assert kw["activation_function"] == "gelu"
    assert kw["max_position_embeddings"] == 1024


def test_real_transformers_config_objects_are_accepted():
    transformers = pytest.importorskip("transformers")
    t5 = transformers.T5Config()  # defaults ARE the t5-small architecture
    assert hf_architecture_kwargs(t5) == hf_architecture_kwargs("t5-small")
    bart = transformers.BartConfig(
        d_model=768, encoder_layers=6, decoder_layers=6,
        encoder_attention_heads=12, decoder_attention_heads=12,
        encoder_ffn_dim=3072, decoder_ffn_dim=3072,
    )
    assert hf_architecture_kwargs(bart) == hf_architecture_kwargs("facebook/bart-base")


def test_t5_gated_variant_maps_to_gated_linear():
    kw = hf_architecture_kwargs(dict(
        model_type="t5", d_model=512, d_ff=1024, num_layers=8,
        num_decoder_layers=8, num_heads=8, d_kv=64, dropout_rate=0.1,
        feed_forward_proj="gated-gelu",
    ))
    assert kw["gated_linear"] is True
    # HF T5Config maps exactly "gated-gelu" to dense_act_fn "gelu_new"
    # (the tanh approximation); plain "gelu" stays exact-erf.
    assert kw["activation_function"] == "gelu_new"


def test_t5_explicit_zero_decoder_layers_not_coerced():
    kw = hf_architecture_kwargs(dict(
        model_type="t5", d_model=512, d_ff=1024, num_layers=8,
        num_decoder_layers=0, num_heads=8, d_kv=64, dropout_rate=0.1,
        feed_forward_proj="relu",
    ))
    # HF falls back to num_layers only on None, not on falsy 0.
    assert kw["decoder_layers"] == 0


def test_bart_unknown_activation_rejected_early():
    import pytest

    with pytest.raises(ValueError, match="activation_function"):
        hf_architecture_kwargs(dict(
            model_type="bart", d_model=512, encoder_layers=6, decoder_layers=6,
            encoder_attention_heads=8, decoder_attention_heads=8,
            encoder_ffn_dim=2048, decoder_ffn_dim=2048, dropout=0.1,
            activation_function="swish", max_position_embeddings=1024,
        ))


def test_t5_decoupled_d_kv_is_rejected():
    with pytest.raises(ValueError, match="d_kv"):
        hf_architecture_kwargs(dict(
            model_type="t5", d_model=512, d_ff=2048, num_layers=6,
            num_decoder_layers=6, num_heads=8, d_kv=128, dropout_rate=0.1,
            feed_forward_proj="relu",
        ))


def test_nonstandard_relative_bias_shape_is_rejected():
    with pytest.raises(ValueError, match="relative-bias"):
        hf_architecture_kwargs(dict(
            model_type="t5", d_model=512, d_ff=2048, num_layers=6,
            num_decoder_layers=6, num_heads=8, d_kv=64, dropout_rate=0.1,
            feed_forward_proj="relu", relative_attention_num_buckets=64,
        ))


def test_unknown_checkpoint_fails_loudly():
    with pytest.raises(ValueError, match="offline architecture table"):
        hf_architecture_kwargs("nonexistent/model-name")


def test_resolve_model_config_derives_dims_from_model_name():
    # Reference t5_small.yaml passes NO dims — they come from AutoConfig.
    cfg = resolve_model_config(
        {"model_type": "T5ForConditionalGeneration",
         "model_name": "google-t5/t5-small"},
        vocab_size=100, pad_token_id=0, bos_token_id=2, eos_token_id=3,
    )
    assert (cfg.d_model, cfg.encoder_ffn_dim) == (512, 2048)
    assert cfg.encoder_layers == cfg.decoder_layers == 6
    # Structural preset still applies on top of the derived dims.
    assert cfg.norm_type == "rmsnorm" and cfg.relative_position_bias
    assert not cfg.attention_bias and not cfg.attention_scale


def test_yaml_kwargs_override_model_name_like_the_reference():
    # Reference hf_bart_medium.yaml names bart-base (d_model 768) but
    # overrides to d_model 512 via kwargs; kwargs must win.
    cfg = resolve_model_config(
        {"model_type": "BartForConditionalGeneration",
         "model_name": "facebook/bart-base", "d_model": 512,
         "encoder_attention_heads": 8, "decoder_attention_heads": 8,
         "encoder_ffn_dim": 2048, "decoder_ffn_dim": 2048},
        vocab_size=100, pad_token_id=0, bos_token_id=2, eos_token_id=3,
    )
    assert (cfg.d_model, cfg.encoder_ffn_dim) == (512, 2048)
    assert cfg.encoder_layers == 6  # un-overridden dim keeps the HF value


def test_custom_model_ignores_model_name():
    # The reference's CustomModel takes dims from explicit YAML kwargs only
    # (wrapper.py:87-167); model_name must not perturb them.
    cfg = resolve_model_config(
        {"model_type": "CustomModel", "model_name": "facebook/bart-base"},
        vocab_size=100, pad_token_id=0, bos_token_id=2, eos_token_id=3,
    )
    assert (cfg.d_model, cfg.encoder_attention_heads) == (512, 8)
