"""Jitted beam search with a lazy-ancestry KV cache.

The reference decodes through HF ``generate`` with ``use_cache=False`` —
every decode step re-runs the full decoder over the whole prefix
(reference wrapper.py:443-451, custom_modeling.py:271-320). Here decoding is
a single ``lax.while_loop`` with:

  * a slot-flattened (2, B, L*K, D) self-attention KV cache whose rows are
    written once and NEVER physically reordered. Beam permutations are
    tracked in an int32 ancestry table (B, K, L): ``anc[b, n, l]`` = which
    slot holds beam n's time-l K/V. Attention contracts every live beam's
    query against every slot's cache (a real MXU matmul instead of a
    per-beam matvec) and a one-hot mul-reduce selects ancestors — round-1's
    physical cache gather cost a full cache read+write per step (12-16
    ms/step at flagship scale, the dominant decode cost);
  * cross-attention K/V projected once per sequence at BATCH size — they are
    beam-invariant, so tiling them x K (round 1) was K x wasted traffic;
  * a provably-safe early exit: the loop stops once no live beam can beat
    the worst finished hypothesis (for sum-logprob scores the optimistic
    bound of a live beam with running sum S is S / max_length), so results
    are identical to running the full static loop.

Semantics follow HF beam search with the reference's generation config
(wrapper.py:308-315): length_penalty 1.0, ``forced_eos_token_id`` at max
length, ``num_return_sequences = num_beams``, sequences sorted by
length-normalized score.

An optional ``logits_hook(state, logprobs, live_seqs, t) -> (state,
logprobs)`` lets guided (formula-constrained) decoding adjust scores
in-graph. The hook runs on LOG-PROBS (after ``log_softmax``, no
renormalization afterwards), matching where HF applies logits processors in
its beam path — scores set to 0 force a token, ``-inf`` bans one. Hook state
is a traced pytree whose leaves are (B, K, ...) — it is permuted with the
beams each step, so per-batch constants (e.g. target formula counts) can be
passed per call without recompiling the graph.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.seq2seq import Seq2SeqModel

NEG_INF = -1.0e7


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
    stage_size: Optional[int] = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sequences (B, num_beams, max_length), scores (B, num_beams)).

    Sequences start with BOS and are padded with pad_token after EOS; beams
    are sorted best-first by normalized score.

    ``stage_size``: decode in stages with growing cache lengths
    (stage_size, 2*stage_size, ..., max_length) — early steps stream a cache
    sized to the prefix actually decoded so far instead of the full
    max_length buffer (~0.6x the L-dependent per-step traffic for 4 stages).
    The stage boundaries only change WHERE buffers are padded, never what is
    attended (positions > t are masked regardless), so results are identical.
    ``None`` disables staging (single full-length loop).
    """
    cfg = model.config
    batch = encoder_mask.shape[0]
    bos, eos, pad = cfg.decoder_start_token_id, cfg.eos_token_id, cfg.pad_token_id

    # int8 KV cache (ModelConfig.kv_cache_dtype): only when the kernel can
    # engage (ops/attention.py kernel_ok) — the XLA fallback would otherwise
    # dequantize the whole cache per step. The kernel's data-append window
    # needs every stage's flat slot axis to be a 64 multiple (stage sizes
    # are rounded up to suit below; the scale buffer pads itself to 128).
    head_dim = cfg.d_model // cfg.decoder_attention_heads
    quantize = (
        getattr(cfg, "kv_cache_dtype", "bfloat16") == "int8"
        and num_beams >= 4
        and num_beams <= 32
        and cfg.d_model % 128 == 0
        and head_dim % 64 == 0
        and (max_length * num_beams) % 32 == 0
        and max_length * num_beams >= 64
        and not cfg.relative_position_bias
        and getattr(cfg, "use_beam_kernel", True)
    )

    if stage_size is None or stage_size >= max_length:
        bounds = [max_length]
    else:
        # Keep every stage's flat slot axis a 32 multiple so the fused
        # kernel (ops/attention.py kernel_ok) engages on every stage.
        req = 32 // math.gcd(num_beams, 32)
        stage_size = ((stage_size + req - 1) // req) * req
        bounds = list(range(stage_size, max_length, stage_size)) + [max_length]

    # Encode once; K/V stay at batch size (beam-invariant).
    encoder_hidden = model.apply(
        variables, encoder_inputs, encoder_mask, method=Seq2SeqModel.encode
    )
    # bf16 models: pre-cast the >=2D weights (matmul kernels, embeddings)
    # to bf16 ONCE outside the decode loop. Flax Dense(dtype=bf16) casts
    # per use anyway, so per-step results are identical — but the in-loop
    # casts re-read the f32 master weights every step (~0.19 GB/step at
    # flagship scale, the largest convert fusions in the round-4 decode
    # trace). 1D leaves (LayerNorm scales/biases) stay f32: norms run f32.
    if model.config.compute_dtype == jnp.bfloat16:
        loop_variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if (hasattr(x, "dtype") and x.dtype == jnp.float32
                and getattr(x, "ndim", 0) >= 2)
            else x,
            variables,
        )
    else:
        loop_variables = variables
    # Prefix staging: allocate the KV cache at FULL length once; each stage's
    # while_loop reads only the flat prefix it has decoded into (the stage
    # length rides in the ancestry slice below). The previous design grew
    # the buffers between stages, which cost a full cache pad/copy per
    # stage transition (6.5 ms/decode at flagship scale, round-4 trace).
    cache = model.apply(
        loop_variables, batch, num_beams, bounds[-1], encoder_hidden,
        quantize, method=Seq2SeqModel.init_beam_cache,
    )
    decode_step = functools.partial(
        model.apply, loop_variables, method=Seq2SeqModel.beam_decode_step
    )

    live_seqs = jnp.full((batch, num_beams, max_length), pad, dtype=jnp.int32)
    live_seqs = live_seqs.at[:, :, 0].set(bos)
    live_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (num_beams - 1))[None, :], (batch, 1)
    )
    finished_seqs = jnp.full((batch, num_beams, max_length), pad, dtype=jnp.int32)
    finished_scores = jnp.full((batch, num_beams), NEG_INF)
    ancestry = jnp.zeros((batch, num_beams, max_length), dtype=jnp.int32)

    def make_cond_fn(stage_bound: int):
        def cond_fn(carry):
            (t, live_seqs, live_scores, finished_seqs, finished_scores,
             selves, ancestry, hook_state) = carry
            # Optimistic bound for a live beam: sum / max_length (sums <= 0).
            best_live = jnp.max(live_scores, axis=1)
            bound = best_live / (float(max_length) ** length_penalty)
            worst_finished = jnp.min(finished_scores, axis=1)
            all_done = jnp.all(worst_finished >= bound)
            return jnp.logical_and(
                t < stage_bound - 1, jnp.logical_not(all_done)
            )
        return cond_fn

    def make_body_fn(stage_len: int):
        return functools.partial(body_fn, stage_len=stage_len)

    def body_fn(carry, stage_len: int):
        (t, live_seqs, live_scores, finished_seqs, finished_scores,
         selves, ancestry, hook_state) = carry

        # This step's K/V rows are written at slot = live-beam index.
        ancestry = ancestry.at[:, :, t].set(
            jnp.arange(num_beams)[None, :]
        )
        current = live_seqs[:, :, t]
        logits, selves = decode_step(
            current, t, {"self": selves, "cross": cache["cross"]},
            ancestry[:, :, :stage_len], encoder_mask,
        )
        logits = logits.astype(jnp.float32)          # (B, K, V)
        vocab = logits.shape[-1]

        # HF processor ordering: log_softmax FIRST, then logits processors on
        # the log-probs without renormalizing (HF generation/utils.py beam
        # path) — so a guided hook's ``score[eos] = 0`` genuinely forces EOS.
        logprobs = jax.nn.log_softmax(logits, axis=-1)

        if logits_hook is not None:
            hook_state, logprobs = logits_hook(
                hook_state, logprobs, live_seqs, t
            )

        # Force EOS at the final position (forced_eos_token_id — an HF
        # processor appended after user processors).
        is_last = t == max_length - 2
        eos_only = jnp.full_like(logprobs, NEG_INF).at[:, :, eos].set(0.0)
        logprobs = jnp.where(is_last, eos_only, logprobs)

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

        # Compose the ancestry instead of gathering the cache: the new beam
        # n's history is its parent's history (an int32 table gather — ~KBs,
        # vs GBs for the cache).
        ancestry = jnp.take_along_axis(
            ancestry, beam_src[:, :, None], axis=1
        )
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
                selves, ancestry, hook_state)

    carry = (jnp.asarray(0), live_seqs, live_scores, finished_seqs,
             finished_scores, cache["self"], ancestry, hook_init)
    for stage_bound in bounds:
        carry = jax.lax.while_loop(
            make_cond_fn(stage_bound), make_body_fn(stage_bound), carry
        )
    (_, live_seqs, live_scores, finished_seqs, finished_scores, _, _, _) = carry

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
