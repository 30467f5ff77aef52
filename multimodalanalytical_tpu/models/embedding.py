"""Multimodal embedding layer.

Per-modality embedding (token table or linear patch projection), optional
per-modality LayerNorm, XVal numerical scaling, sequence-axis concatenation
and positional encodings. Reference behavior: modeling/utils.py:44-182.

Input protocol: ``inputs`` maps modality name to either
  * int token ids (B, L),
  * float patches (B, L, patch_size),
  * {"tokenized_input": ids, "numerical_values": floats}  (XVal),
  * {"tokenized_input": ids, "token_indices": positions}  (peak pos-enc).

Improvement over the reference: when ``token_indices`` are provided, the
positional encodings are gathered at the true spectral positions — the
reference carries the indices but its embedding ignores them
(modeling/utils.py:213-224 always uses 0..L).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.positional import POS_ENC_REGISTRY

TEXT_LIKE_TYPES = (
    "text", "text_spectrum", "peak_positional_encoding",
    "run_length_encoding", "multiplets", "carbon", "msms_text",
)
PATCH_TYPES = ("1D_patches", "msms_number")


class PatchProjection(nn.Module):
    """Linear / 2-layer / 3-layer patch embedder
    (reference modeling/utils.py:107-136)."""

    d_model: int
    encoding_type: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.xavier_uniform()
        dense = lambda dim, name: nn.Dense(  # noqa: E731
            dim, dtype=self.dtype, kernel_init=init, name=name
        )
        if self.encoding_type in ("linear", ""):
            return dense(self.d_model, "proj")(patches)
        if self.encoding_type == "linear_2_layer":
            hidden = nn.relu(dense(self.d_model // 2, "proj_0")(patches))
            return dense(self.d_model, "proj_1")(hidden)
        if self.encoding_type == "linear_3_layer":
            hidden = nn.relu(dense(self.d_model // 3, "proj_0")(patches))
            hidden = nn.relu(dense(2 * (self.d_model // 3), "proj_1")(hidden))
            return dense(self.d_model, "proj_2")(hidden)
        raise NotImplementedError(f"Unknown encoding_type {self.encoding_type}")


class MultimodalEmbedding(nn.Module):
    data_config: Any          # dict: modality -> config (hashable via static arg)
    d_model: int
    embedding_norm: bool = True
    do_positional_encodings: bool = False
    positional_encodings_type: str = "sin_cos"
    max_seq_len: int = 1024
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        embeds: Dict[str, nn.Module] = {}
        norms: Dict[str, nn.Module] = {}
        for modality, modality_config in self.data_config.items():
            mtype = modality_config["type"]
            if mtype in TEXT_LIKE_TYPES:
                embeds[modality] = nn.Embed(
                    modality_config["vocab_size"], self.d_model,
                    embedding_init=nn.initializers.xavier_uniform(),
                    dtype=self.dtype, name=f"embed_{modality}",
                )
            elif mtype in PATCH_TYPES:
                args = modality_config.get("preprocessor_arguments") or {}
                embeds[modality] = PatchProjection(
                    self.d_model,
                    encoding_type=args.get("encoding_type", "linear"),
                    dtype=self.dtype, name=f"embed_{modality}",
                )
            elif mtype == "no_action":
                # Raw passthrough features (reference fits n_features at
                # data_utils.py:118-124 but its embedding has no branch —
                # this closes that gap): linear projection of (B, L, F) rows.
                embeds[modality] = PatchProjection(
                    self.d_model, encoding_type="linear",
                    dtype=self.dtype, name=f"embed_{modality}",
                )
            else:
                raise NotImplementedError(f"Unknown modality type: {mtype}")
            if self.embedding_norm:
                # Reference normalises in fp32 (modeling/utils.py:165-168).
                # eps 1e-5 = torch default (parity with the reference's
                # nn.LayerNorm, tests/test_reference_model_parity.py).
                norms[modality] = nn.LayerNorm(
                    epsilon=1e-5, dtype=jnp.float32, name=f"norm_{modality}"
                )
        self.embedding_layers = embeds
        self.embedding_norms = norms
        if self.do_positional_encodings:
            self.positional_encodings = POS_ENC_REGISTRY[self.positional_encodings_type](
                self.d_model, self.max_seq_len, name="pos_enc"
            )

    def embed_modality(self, modality: str, modality_input: Any,
                       apply_norm: bool = True):
        """Returns (embedding (B, L, D), explicit positions (B, L) or None)."""
        positions: Optional[jnp.ndarray] = None
        if isinstance(modality_input, dict):
            ids = modality_input["tokenized_input"]
            embedding = self.embedding_layers[modality](ids)
            if "numerical_values" in modality_input:  # XVal scaling
                embedding = embedding * modality_input["numerical_values"][..., None]
            if "token_indices" in modality_input:
                positions = modality_input["token_indices"]
        else:
            embedding = self.embedding_layers[modality](modality_input)
        if self.embedding_norm and apply_norm:
            embedding = self.embedding_norms[modality](embedding.astype(jnp.float32))
            embedding = embedding.astype(self.dtype)
        return embedding, positions

    def __call__(
        self,
        inputs: Dict[str, Any],
        decode_positions: Optional[jnp.ndarray] = None,
        apply_norm: bool = True,
    ) -> jnp.ndarray:
        """Embed + concat modalities along the sequence axis.

        ``decode_positions`` (B, L) overrides positional-encoding positions
        (incremental decoding embeds one token at absolute position t).
        ``apply_norm=False`` skips the per-modality norms — the executed
        HF-BART graph wires the decoder to the RAW target embedding
        (reference wrapper.py:70-72) while the norm params still exist.
        """
        parts = []
        position_parts = []
        offset = 0
        # Iterate in the STATIC data_config order, never the input dict's:
        # jit canonicalizes dict pytrees to sorted key order, which would
        # silently scramble the concat order against the collator's mask
        # layout for any config whose sorted order differs (multimodal:
        # Formula,Multiplets,Carbon,IR sorts to Carbon,Formula,IR,...).
        ordered = [m for m in self.data_config if m in inputs]
        # target-modality decode calls pass single keys not in encoder order
        ordered += [m for m in inputs if m not in ordered]
        for modality in ordered:
            embedding, explicit_positions = self.embed_modality(
                modality, inputs[modality], apply_norm=apply_norm)
            parts.append(embedding)
            seg_len = embedding.shape[1]
            if explicit_positions is not None:
                position_parts.append(explicit_positions)
            else:
                position_parts.append(
                    jnp.broadcast_to(
                        jnp.arange(offset, offset + seg_len)[None, :],
                        (embedding.shape[0], seg_len),
                    )
                )
            offset += seg_len

        full = jnp.concatenate(parts, axis=1)
        if self.do_positional_encodings:
            if decode_positions is not None:
                positions = decode_positions
            else:
                positions = jnp.concatenate(position_parts, axis=1)
            full = full + self.positional_encodings(full, positions).astype(full.dtype)
        return full
