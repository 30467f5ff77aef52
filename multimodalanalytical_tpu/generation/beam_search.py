"""Jitted beam search with KV cache.

The reference decodes through HF ``generate`` with ``use_cache=False`` —
every decode step re-runs the full decoder over the whole prefix
(reference wrapper.py:443-451, custom_modeling.py:271-320). Here decoding is
a single ``lax.while_loop`` with:

  * a fused time-major KV cache updated in place (one contiguous (B, D) row
    per step) and cross-attention K/V projected once per sequence;
  * beam reordering that gathers ONLY the self-attention caches — the
    cross K/V are beam-invariant and never move;
  * a provably-safe early exit: the loop stops once no live beam can beat
    the worst finished hypothesis (for sum-logprob scores the optimistic
    bound of a live beam with running sum S is S / max_length), so results
    are identical to running the full static loop.

Semantics follow HF beam search with the reference's generation config
(wrapper.py:308-315): length_penalty 1.0, ``forced_eos_token_id`` at max
length, ``num_return_sequences = num_beams``, sequences sorted by
length-normalized score.

An optional ``logits_hook(state, logits, live_seqs, t) -> (state, logits)``
lets guided (formula-constrained) decoding adjust scores in-graph.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.seq2seq import Seq2SeqModel

NEG_INF = -1.0e7


def _gather_self_caches(selves, indices, batch, beams):
    """Reorder the beam axis of fused (2, B*K, L, D) cache buffers.

    ``indices`` (batch, beams): for each slot, which old beam to keep.
    Implemented as a one-hot matmul instead of take_along_axis — XLA lowers
    elementwise gathers over a middle axis to scalar-granularity loads on
    TPU, while the one-hot contraction moves whole (L, D) blocks.
    """
    if beams == 1:
        return selves
    perm = jax.nn.one_hot(indices, beams, dtype=selves[0].dtype)  # (B, Kn, Ko)

    def gather(cache):
        two, bk, length, d = cache.shape
        unflat = cache.reshape(two, batch, beams, length, d)
        picked = jnp.einsum(
            "bnk,cbkld->cbnld", perm, unflat,
            preferred_element_type=cache.dtype,
        )
        return picked.reshape(two, bk, length, d)

    return [gather(c) for c in selves]


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

    decode_step = functools.partial(
        model.apply, variables, method=Seq2SeqModel.decode_step
    )

    live_seqs = jnp.full((batch, num_beams, max_length), pad, dtype=jnp.int32)
    live_seqs = live_seqs.at[:, :, 0].set(bos)
    live_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (num_beams - 1))[None, :], (batch, 1)
    )
    finished_seqs = jnp.full((batch, num_beams, max_length), pad, dtype=jnp.int32)
    finished_scores = jnp.full((batch, num_beams), NEG_INF)

    def cond_fn(carry):
        (t, live_seqs, live_scores, finished_seqs, finished_scores,
         selves, hook_state) = carry
        # Optimistic bound for any live beam: sum / max_length (sums are <= 0).
        best_live = jnp.max(live_scores, axis=1)
        bound = best_live / (float(max_length) ** length_penalty)
        worst_finished = jnp.min(finished_scores, axis=1)
        all_done = jnp.all(worst_finished >= bound)
        return jnp.logical_and(t < max_length - 1, jnp.logical_not(all_done))

    def body_fn(carry):
        (t, live_seqs, live_scores, finished_seqs, finished_scores,
         selves, hook_state) = carry

        current = live_seqs.reshape(batch * num_beams, max_length)[:, t][:, None]
        logits, new_cache = decode_step(
            current, t, {"self": selves, "cross": cache["cross"]}, tiled_mask
        )
        selves = new_cache["self"]
        logits = logits.astype(jnp.float32)

        if logits_hook is not None:
            hook_state, hooked = logits_hook(
                hook_state, logits.reshape(batch, num_beams, -1), live_seqs, t
            )
            logits = hooked.reshape(batch * num_beams, -1)

        vocab = logits.shape[-1]
        # Force EOS at the final position (forced_eos_token_id).
        is_last = t == max_length - 2
        eos_only = jnp.full_like(logits, NEG_INF).at[:, eos].set(0.0)
        logits = jnp.where(is_last, eos_only, logits)

        logprobs = jax.nn.log_softmax(logits, axis=-1)
        logprobs = logprobs.reshape(batch, num_beams, vocab)

        total = live_scores[:, :, None] + logprobs
        flat_total = total.reshape(batch, num_beams * vocab)

        topk_scores, topk_idx = jax.lax.top_k(flat_total, 2 * num_beams)
        topk_beam = topk_idx // vocab
        topk_token = topk_idx % vocab

        cand_seqs = jnp.take_along_axis(
            live_seqs, topk_beam[:, :, None], axis=1
        ).at[:, :, t + 1].set(topk_token)

        is_eos = topk_token == eos

        # ---- update finished pool with EOS candidates -------------------
        # HF normalizes by the hypothesis length excluding the EOS being
        # sampled (BeamHypotheses.add); the prefix holds t+1 tokens.
        norm = ((t + 1).astype(jnp.float32)) ** length_penalty
        cand_fin = jnp.where(is_eos, topk_scores / norm, NEG_INF)
        merged_scores = jnp.concatenate([finished_scores, cand_fin], axis=1)
        merged_seqs = jnp.concatenate([finished_seqs, cand_seqs], axis=1)
        finished_scores, fin_idx = jax.lax.top_k(merged_scores, num_beams)
        finished_seqs = jnp.take_along_axis(
            merged_seqs, fin_idx[:, :, None], axis=1
        )

        # ---- top-K non-EOS continuations as new live beams --------------
        live_cand = jnp.where(is_eos, NEG_INF, topk_scores)
        live_scores, live_idx = jax.lax.top_k(live_cand, num_beams)
        live_seqs = jnp.take_along_axis(cand_seqs, live_idx[:, :, None], axis=1)
        beam_src = jnp.take_along_axis(topk_beam, live_idx, axis=1)

        selves = _gather_self_caches(selves, beam_src, batch, num_beams)
        if logits_hook is not None and hook_state is not None:
            hook_state = jax.tree_util.tree_map(
                lambda leaf: jnp.take_along_axis(
                    leaf,
                    beam_src.reshape(beam_src.shape + (1,) * (leaf.ndim - 2)),
                    axis=1,
                ),
                hook_state,
            )

        return (t + 1, live_seqs, live_scores, finished_seqs, finished_scores,
                selves, hook_state)

    carry = (jnp.asarray(0), live_seqs, live_scores, finished_seqs,
             finished_scores, cache["self"], hook_init)
    carry = jax.lax.while_loop(cond_fn, body_fn, carry)
    (_, live_seqs, live_scores, finished_seqs, finished_scores, _, _) = carry

    # Finalize: surviving live beams compete with the finished pool
    # (HF BeamHypotheses.add semantics on finalization).
    live_norm = float(max_length) ** length_penalty
    merged_scores = jnp.concatenate(
        [finished_scores, live_scores / live_norm], axis=1
    )
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
