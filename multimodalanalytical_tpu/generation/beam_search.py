"""Jitted beam search with KV cache.

The reference decodes through HF ``generate`` with ``use_cache=False`` —
every decode step re-runs the full decoder over the whole prefix
(reference wrapper.py:443-451, custom_modeling.py:271-320). Here decoding is
a single ``lax.scan`` over steps with a static max length, a functional
KV cache updated in place, and cross-attention K/V projected once.

Semantics follow HF beam search with the reference's generation config
(wrapper.py:308-315): length_penalty 1.0, early_stopping False (we simply run
the full static loop — insertion into a best-K finished pool makes the result
identical), ``forced_eos_token_id`` at max length, ``num_return_sequences =
num_beams``, sequences sorted by length-normalized score.

An optional ``logits_hook(step_state, logits) -> (step_state, logits)`` lets
guided (formula-constrained) decoding adjust scores in-graph.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.seq2seq import Seq2SeqModel

NEG_INF = -1.0e7


def _flatten_beam(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])


def _unflatten_beam(x: jnp.ndarray, batch: int, beams: int) -> jnp.ndarray:
    return x.reshape((batch, beams) + x.shape[1:])


def _gather_beams(tree: Any, indices: jnp.ndarray, batch: int, beams: int) -> Any:
    """Select beam slices: indices (batch, new_beams) over old beam axis."""

    def gather(leaf):
        unflat = _unflatten_beam(leaf, batch, beams)
        return _flatten_beam(jnp.take_along_axis(
            unflat,
            indices.reshape(indices.shape + (1,) * (unflat.ndim - 2)),
            axis=1,
        ))

    return jax.tree_util.tree_map(gather, tree)


def beam_search(
    model: Seq2SeqModel,
    variables: Dict[str, Any],
    encoder_inputs: Dict[str, Any],
    encoder_mask: jnp.ndarray,
    num_beams: int,
    max_length: int = 128,
    length_penalty: float = 1.0,
    logits_hook: Optional[Callable] = None,
    hook_init: Optional[Any] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sequences (B, num_beams, max_length), scores (B, num_beams)).

    Sequences start with BOS and are padded with pad_token after EOS; beams
    are sorted best-first by normalized score.
    """
    cfg = model.config
    batch = encoder_mask.shape[0]
    bos, eos, pad = cfg.decoder_start_token_id, cfg.eos_token_id, cfg.pad_token_id

    # Encode once; tile across beams.
    encoder_hidden = model.apply(
        variables, encoder_inputs, encoder_mask, method=Seq2SeqModel.encode
    )

    def tile(x):
        return jnp.repeat(x, num_beams, axis=0)

    tiled_hidden = tile(encoder_hidden)
    tiled_mask = tile(encoder_mask)

    cache = model.apply(
        variables, batch * num_beams, max_length, tiled_hidden,
        method=Seq2SeqModel.init_cache,
    )

    decode_step = functools.partial(model.apply, variables, method=Seq2SeqModel.decode_step)

    # State arrays.
    live_seqs = jnp.full((batch, num_beams, max_length), pad, dtype=jnp.int32)
    live_seqs = live_seqs.at[:, :, 0].set(bos)
    live_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (num_beams - 1))[None, :], (batch, 1)
    )
    finished_seqs = jnp.full((batch, num_beams, max_length), pad, dtype=jnp.int32)
    finished_scores = jnp.full((batch, num_beams), NEG_INF)

    hook_state = hook_init

    def step_fn(carry, t):
        live_seqs, live_scores, finished_seqs, finished_scores, cache, hook_state = carry

        current = _flatten_beam(live_seqs[:, :, :])[:, t][:, None]  # (B*K, 1)
        logits, cache = decode_step(current, t, cache, tiled_mask)
        logits = logits.astype(jnp.float32)

        if logits_hook is not None:
            hook_state, logits = logits_hook(
                hook_state, _unflatten_beam(logits, batch, num_beams),
                live_seqs, t,
            )
            logits = _flatten_beam(logits)

        # Force EOS at the final position (forced_eos_token_id).
        vocab = logits.shape[-1]
        is_last = t == max_length - 2
        eos_only = jnp.full_like(logits, NEG_INF).at[:, eos].set(0.0)
        logits = jnp.where(is_last, eos_only, logits)

        logprobs = jax.nn.log_softmax(logits, axis=-1)
        logprobs = _unflatten_beam(logprobs, batch, num_beams)  # (B, K, V)

        total = live_scores[:, :, None] + logprobs  # (B, K, V)
        flat_total = total.reshape(batch, num_beams * vocab)

        # 2K candidates like HF (enough non-EOS continuations survive).
        topk_scores, topk_idx = jax.lax.top_k(flat_total, 2 * num_beams)
        topk_beam = topk_idx // vocab
        topk_token = topk_idx % vocab

        # Candidate sequences with the new token written at t+1.
        cand_seqs = jnp.take_along_axis(
            live_seqs, topk_beam[:, :, None], axis=1
        ).at[:, :, t + 1].set(topk_token)

        is_eos = topk_token == eos

        # ---- update finished pool with EOS candidates -------------------
        # HF normalizes by the hypothesis length excluding the EOS being
        # sampled (BeamHypotheses.add: hyp.shape[-1] ** length_penalty);
        # the prefix holds t+1 tokens at step t.
        norm = ((t + 1).astype(jnp.float32)) ** length_penalty
        cand_finished_scores = jnp.where(is_eos, topk_scores / norm, NEG_INF)
        merged_scores = jnp.concatenate([finished_scores, cand_finished_scores], axis=1)
        merged_seqs = jnp.concatenate([finished_seqs, cand_seqs], axis=1)
        top_fin_scores, top_fin_idx = jax.lax.top_k(merged_scores, num_beams)
        finished_scores = top_fin_scores
        finished_seqs = jnp.take_along_axis(merged_seqs, top_fin_idx[:, :, None], axis=1)

        # ---- pick top-K non-EOS continuations as new live beams ---------
        live_cand_scores = jnp.where(is_eos, NEG_INF, topk_scores)
        new_live_scores, live_idx = jax.lax.top_k(live_cand_scores, num_beams)
        new_live_seqs = jnp.take_along_axis(cand_seqs, live_idx[:, :, None], axis=1)
        new_beam_src = jnp.take_along_axis(topk_beam, live_idx, axis=1)

        cache = _gather_beams(cache, new_beam_src, batch, num_beams)
        if logits_hook is not None and hook_state is not None:
            hook_state = jax.tree_util.tree_map(
                lambda leaf: jnp.take_along_axis(
                    leaf, new_beam_src.reshape(
                        new_beam_src.shape + (1,) * (leaf.ndim - 2)
                    ), axis=1,
                ),
                hook_state,
            )

        carry = (new_live_seqs, new_live_scores, finished_seqs, finished_scores,
                 cache, hook_state)
        return carry, None

    carry = (live_seqs, live_scores, finished_seqs, finished_scores, cache, hook_state)
    carry, _ = jax.lax.scan(step_fn, carry, jnp.arange(max_length - 1))
    live_seqs, live_scores, finished_seqs, finished_scores, _, _ = carry

    # Finalize: surviving live beams compete with the finished pool
    # (HF BeamHypotheses.add semantics on finalization).
    live_norm = float(max_length) ** length_penalty
    merged_scores = jnp.concatenate([finished_scores, live_scores / live_norm], axis=1)
    merged_seqs = jnp.concatenate([finished_seqs, live_seqs], axis=1)
    final_scores, final_idx = jax.lax.top_k(merged_scores, num_beams)
    final_seqs = jnp.take_along_axis(merged_seqs, final_idx[:, :, None], axis=1)

    return final_seqs, final_scores


def greedy_decode(
    model: Seq2SeqModel,
    variables: Dict[str, Any],
    encoder_inputs: Dict[str, Any],
    encoder_mask: jnp.ndarray,
    max_length: int = 128,
) -> jnp.ndarray:
    """Greedy decoding = beam search with one beam; returns (B, max_length)."""
    seqs, _ = beam_search(
        model, variables, encoder_inputs, encoder_mask,
        num_beams=1, max_length=max_length,
    )
    return seqs[:, 0, :]
