"""The flagship model: multimodal encoder-decoder seq2seq.

One Flax model family covering the reference's CustomModel / CustomBart /
BART / T5 variants (reference modeling/custom_modeling.py:323-508,
wrapper.py:32-227) with TPU-first mechanics:

  * ``encode`` / ``decode_train`` / ``decode_step`` are separate pure
    functions of params so generation can jit a step with a KV cache;
  * loss is computed in-graph (CE with -100 masking + optional align loss);
  * static shapes; masks are (B, L) keep-masks converted to additive biases.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import make_attention_bias, make_causal_bias
from .align import ALIGN_LOSSES, AlignNetwork
from .config import ModelConfig
from .embedding import MultimodalEmbedding
from .transformer import Decoder, Encoder


def cross_entropy_loss(
    logits: jnp.ndarray,        # (B, L, V)
    labels: jnp.ndarray,        # (B, L) with -100 = ignore
) -> jnp.ndarray:
    """Mean CE over non-ignored positions (torch CrossEntropyLoss parity)."""
    vocab = logits.shape[-1]
    mask = labels != -100
    safe_labels = jnp.where(mask, labels, 0)
    logp = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(picked * mask)
    count = jnp.maximum(jnp.sum(mask), 1)
    return -total / count


class Seq2SeqModel(nn.Module):
    config: ModelConfig
    data_config: Any       # modality -> config dict (static)
    target_modality: str
    multimodal_norm: bool = True

    def setup(self) -> None:
        cfg = self.config
        dtype = cfg.compute_dtype
        self.embedding = MultimodalEmbedding(
            data_config=self.data_config,
            d_model=cfg.d_model,
            embedding_norm=self.multimodal_norm,
            do_positional_encodings=cfg.use_absolute_positions,
            positional_encodings_type=cfg.positional_encoding_type,
            max_seq_len=cfg.max_position_embeddings,
            dtype=dtype,
            name="embedding",
        )
        self.encoder = Encoder(
            cfg.encoder_layers, cfg.d_model, cfg.encoder_attention_heads,
            cfg.encoder_ffn_dim, cfg.dropout, cfg.activation_function,
            cfg.gated_linear, cfg.post_layer_normalisation,
            final_norm=cfg.final_layer_norm, dtype=dtype,
            use_flash=cfg.use_flash_attention,
            norm_type=cfg.norm_type,
            relative_bias=cfg.relative_position_bias,
            attention_bias=cfg.attention_bias,
            attention_scale=cfg.attention_scale,
            ffn_bias=cfg.ffn_bias,
            name="encoder",
        )
        self.decoder = Decoder(
            cfg.decoder_layers, cfg.d_model, cfg.decoder_attention_heads,
            cfg.decoder_ffn_dim, cfg.dropout, cfg.activation_function,
            cfg.gated_linear, cfg.post_layer_normalisation,
            final_norm=cfg.final_layer_norm, dtype=dtype,
            use_flash=cfg.use_flash_attention,
            use_beam_kernel=getattr(cfg, "use_beam_kernel", True),
            norm_type=cfg.norm_type,
            relative_bias=cfg.relative_position_bias,
            attention_bias=cfg.attention_bias,
            attention_scale=cfg.attention_scale,
            ffn_bias=cfg.ffn_bias,
            name="decoder",
        )
        self.lm_head = nn.Dense(
            cfg.vocab_size, dtype=jnp.float32, use_bias=cfg.lm_head_bias,
            kernel_init=nn.initializers.xavier_uniform(), name="lm_head",
        )
        if cfg.decoder_embedding_layernorm:
            # HF BART's decoder layernorm_embedding: applied AFTER adding
            # positional encodings (modeling_bart BartDecoder.forward); the
            # encoder's counterpart is replaced by a DummyLayer in the
            # reference's surgery (wrapper.py:74-77).
            self.decoder_emb_norm = nn.LayerNorm(
                epsilon=1e-5, dtype=jnp.float32, name="decoder_emb_norm",
            )
        if cfg.align_config is not None:
            self.align_network = AlignNetwork(cfg.align_config, dtype=jnp.float32,
                                              name="align_network")

    def _embed_target(self, inputs, decode_positions=None):
        """Decoder-side target embedding honoring the preset's decoder
        embedding semantics (per-modality norm on/off + optional HF-BART
        post-position layernorm_embedding)."""
        cfg = self.config
        embeds = self.embedding(
            inputs, decode_positions=decode_positions,
            apply_norm=cfg.decoder_modality_norm,
        )
        if cfg.decoder_embedding_layernorm:
            embeds = self.decoder_emb_norm(
                embeds.astype(jnp.float32)).astype(embeds.dtype)
        return embeds

    def _logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """lm_head with T5's tied-embedding d**-0.5 output scaling."""
        hidden = hidden.astype(jnp.float32)
        if self.config.tied_logits_scale:
            hidden = hidden * (self.config.d_model ** -0.5)
        return self.lm_head(hidden)

    # ------------------------------------------------------------- encode
    def encode(
        self, encoder_inputs: Dict[str, Any], encoder_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        embeds = self.embedding(encoder_inputs)
        bias = make_attention_bias(encoder_mask)
        return self.encoder(embeds, bias, deterministic)

    # -------------------------------------------------------- decode (train)
    def decode_train(
        self,
        decoder_ids: jnp.ndarray,        # (B, Lt)
        decoder_mask: jnp.ndarray,       # (B, Lt) keep-mask
        encoder_hidden: jnp.ndarray,
        encoder_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        embeds = self._embed_target({self.target_modality: decoder_ids})
        seq_len = decoder_ids.shape[1]
        # Causal + padding bias. The reference additionally masks padded
        # target positions via tgt_key_padding_mask (custom_modeling.py:316).
        self_bias = make_causal_bias(seq_len) + make_attention_bias(decoder_mask)
        cross_bias = make_attention_bias(encoder_mask)
        hidden, _ = self.decoder(
            embeds, encoder_hidden, self_bias, cross_bias, deterministic
        )
        return self._logits(hidden)

    # --------------------------------------------------------- decode (step)
    def init_cache(self, batch_size: int, max_length: int, encoder_hidden: jnp.ndarray):
        """Allocate the decode cache.

        Returns {"self": [per-layer (2, B, L_max, D) fused batch-major K/V],
        "cross": [per-layer precomputed (k, v)]}. Batch-major keeps each
        row's (time x feature) block contiguous for the per-step attention
        reads (the dominant decode traffic); the cross K/V are beam-invariant
        and are kept separate so beam search never gathers them.
        """
        cfg = self.config
        cross = self.decoder.project_cross_kv(encoder_hidden)
        selves = [
            jnp.zeros((2, batch_size, max_length, cfg.d_model),
                      dtype=cfg.compute_dtype)
            for _ in range(cfg.decoder_layers)
        ]
        return {"self": selves, "cross": cross}

    def init_beam_cache(
        self, batch_size: int, num_beams: int, max_length: int,
        encoder_hidden: jnp.ndarray, quantize: bool = False,
    ):
        """Allocate the lazy-ancestry beam-decode cache.

        Returns {"self": [per-layer (2, B, L*K, D) slot-flattened buffers],
        "cross": [per-layer UN-tiled (k, v)]}. Flat index l*K + s holds the
        K/V that beam-slot s wrote at time l; rows are written once and
        NEVER physically reordered — beam search keeps an ancestry table
        instead (see ops/attention.py beam_decode_self_attention). The flat
        batch-major layout makes both the per-step write (one contiguous
        (K, D) block per batch row) and the Pallas kernel's block reads
        relayout-free. Cross K/V are beam-invariant and stay at batch size
        (the round-1 design tiled them x K).
        """
        cfg = self.config
        # Flat (B, Ls, D) cross K/V: consumed by the fused beam cross
        # kernel (and the flat-aware XLA fallback) without head-splitting.
        cross = self.decoder.project_cross_kv(encoder_hidden, flat=True)
        flat = max_length * num_beams
        if quantize:
            # int8 storage + per-(slot, head) fp32 dequant scales — halves
            # the dominant decode HBM traffic (see ops/beam_attention.py).
            # The scale flat axis is padded to a 128 multiple so the
            # kernel's lane-aligned scale-append window always fits; the
            # pad lanes are never read.
            heads = cfg.decoder_attention_heads
            flat_pad = (flat + 127) // 128 * 128
            selves: list = [
                {
                    "data": jnp.zeros((2, batch_size, flat, cfg.d_model),
                                      dtype=jnp.int8),
                    "scale": jnp.zeros((2, batch_size, heads, flat_pad),
                                       dtype=jnp.float32),
                }
                for _ in range(cfg.decoder_layers)
            ]
        else:
            selves = [
                jnp.zeros((2, batch_size, flat, cfg.d_model),
                          dtype=cfg.compute_dtype)
                for _ in range(cfg.decoder_layers)
            ]
        return {"self": selves, "cross": cross}

    def beam_decode_step(
        self,
        token_ids: jnp.ndarray,          # (B, K) current tokens per beam
        position: jnp.ndarray,           # scalar int step index
        cache,
        ancestry: jnp.ndarray,           # (B, K, L) int32 slot table
        encoder_mask: jnp.ndarray,       # (B, Ls) UN-tiled keep-mask
    ) -> Tuple[jnp.ndarray, Any]:
        """Beam decode step; returns (logits (B, K, V), updated self caches)."""
        batch, beams = token_ids.shape
        positions = jnp.full((batch * beams, 1), position, dtype=jnp.int32)
        embeds = self._embed_target(
            {self.target_modality: token_ids.reshape(batch * beams, 1)},
            decode_positions=positions,
        )
        # The whole decode step runs on FLAT (B*K, D) 2D arrays (see
        # DecoderLayer.beam_decode_step) — only the logits reshape back.
        x = embeds.reshape(batch * beams, self.config.d_model)
        cross_bias = make_attention_bias(encoder_mask)
        hidden, new_selves = self.decoder.beam_decode_step(
            x, cache["self"], ancestry, cache["cross"], cross_bias, position
        )
        logits = self._logits(hidden).reshape(batch, beams, -1)
        return logits, new_selves

    def decode_step(
        self,
        token_ids: jnp.ndarray,          # (B, 1) current tokens
        position: jnp.ndarray,           # scalar int step index
        cache,
        encoder_mask: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, Any]:
        """Single-token decode with KV cache; returns (logits (B, V), cache)."""
        batch = token_ids.shape[0]
        positions = jnp.full((batch, 1), position, dtype=jnp.int32)
        embeds = self._embed_target(
            {self.target_modality: token_ids}, decode_positions=positions
        )
        cross_bias = make_attention_bias(encoder_mask)
        hidden, new_selves = self.decoder.decode_step(
            embeds, cache["self"], cache["cross"], cross_bias, position
        )
        logits = self._logits(hidden)
        return logits[:, 0, :], {"self": new_selves, "cross": cache["cross"]}

    # ----------------------------------------------------------- training
    def __call__(
        self,
        encoder_inputs: Dict[str, Any],
        encoder_mask: jnp.ndarray,
        decoder_ids: jnp.ndarray,
        decoder_mask: jnp.ndarray,
        labels: jnp.ndarray,
        align_target: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        encoder_hidden = self.encode(encoder_inputs, encoder_mask, deterministic)
        logits = self.decode_train(
            decoder_ids, decoder_mask, encoder_hidden, encoder_mask, deterministic
        )
        ce = cross_entropy_loss(logits, labels)

        align_loss = jnp.asarray(0.0, dtype=jnp.float32)
        total = ce
        if cfg.align_config is not None and align_target is not None:
            # Mean-pool unmasked encoder states (custom_modeling.py:462-471).
            mask = encoder_mask[..., None].astype(jnp.float32)
            pooled = jnp.sum(encoder_hidden.astype(jnp.float32) * mask, axis=1) / (
                jnp.sum(mask, axis=1) + 1e-9
            )
            pred = self.align_network(pooled)
            # Fully-masked rows are batch-padding dummies; exclude them from
            # the alignment loss (CE already excludes them via -100 labels).
            row_valid = (encoder_mask.sum(axis=1) > 0).astype(jnp.float32)
            target = align_target.astype(jnp.float32)
            pred = pred * row_valid[:, None]
            target = target * row_valid[:, None]
            raw = ALIGN_LOSSES[cfg.align_config.loss_function](pred, target)
            # mse/mae average over all rows; rescale to valid rows only.
            scale = pred.shape[0] / jnp.maximum(row_valid.sum(), 1.0)
            align_loss = raw * scale
            total = ce + cfg.align_config.loss_lambda * align_loss

        return {
            "loss": total,
            "model_only_loss": ce,
            "alignment_loss": align_loss,
            "logits": logits,
        }
