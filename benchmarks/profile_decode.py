"""Decode-path component profiler (run on the real TPU chip).

Round-1 measured beam-10 decode at ~69 ms/step for batch 128 x len 128
(BENCH_r01: 8.78 s/batch) vs an ~6-8 ms HBM traffic floor. This script
times each component of the beam step in isolation so the gap can be
attributed, and A/Bs candidate fixes:

  loop_noop     while-loop overhead floor (trivial body)
  decode_only   6-layer cached decode_step, no beam logic (mandatory traffic)
  gather_5d     current one-hot einsum cache reorder  "bnk,cbkld->cbnld"
  gather_bmm    matmul-reshaped reorder               "bnk,bkm->bnm"
  gather_taa    take_along_axis reorder
  bookkeep      top_k + candidate bookkeeping only
  beam_full     the shipped beam_search end to end
  greedy        shipped beam_search with num_beams=1

Usage: python benchmarks/profile_decode.py [variant ...]   (default: all)
Each variant prints one line: name, total s, ms/step, implied GB/s.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 128
BEAMS = 10
MAXLEN = 128
D_MODEL = 512
LAYERS = 6
VOCAB = 320  # realistic SMILES vocab scale (reference tokenizers ~100-600)
STEPS = MAXLEN - 1
BK = BATCH * BEAMS

# Per-step mandatory self-cache traffic (read whole cache once):
# LAYERS * 2(kv) * BK * MAXLEN * D * 2B
CACHE_BYTES = LAYERS * 2 * BK * MAXLEN * D_MODEL * 2


def _model_and_batch():
    from __graft_entry__ import _example_batch, _flagship

    model = _flagship(d_model=D_MODEL, layers=LAYERS, ffn=2048, vocab=VOCAB,
                      dtype="bfloat16")
    batch = _example_batch(batch=BATCH, n_patches=14, patch=125,
                           formula_len=12, target_len=40, vocab=VOCAB)
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    return model, variables, batch


def _scalarize(fn):
    """Reduce fn's full output to one scalar in-graph.

    device_get of a large buffer streams it over the (slow) axon tunnel and
    dominates the measurement; a scalar keeps the sync but moves 4 bytes.
    """
    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return jax.jit(wrapped)


def _time(fn, *args, reps=3):
    out = fn(*args)
    assert np.ndim(out) == 0, "timed fn must return a scalar"
    jax.device_get(out)  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _report(name, secs, steps=STEPS, bytes_per_step=None):
    ms = secs / steps * 1e3
    gbs = (bytes_per_step / (secs / steps)) / 1e9 if bytes_per_step else 0.0
    print(f"{name:14s} total {secs*1e3:9.1f} ms   {ms:8.3f} ms/step"
          + (f"   implied {gbs:7.1f} GB/s" if bytes_per_step else ""))


def make_caches(key):
    ks = jax.random.split(key, LAYERS)
    return [jax.random.normal(k, (2, BK, MAXLEN, D_MODEL), jnp.bfloat16)
            for k in ks]


def run_loop_noop():
    @_scalarize
    def f(x):
        def body(t, c):
            return c + 1.0
        return jax.lax.fori_loop(0, STEPS, body, x)

    _report("loop_noop", _time(f, jnp.zeros((8, 128), jnp.float32)))


def run_decode_only():
    model, variables, batch = _model_and_batch()
    from multimodalanalytical_tpu.models.seq2seq import Seq2SeqModel

    @_scalarize
    def f(variables, enc_inputs, enc_mask):
        hidden = model.apply(variables, enc_inputs, enc_mask,
                             method=Seq2SeqModel.encode)
        tiled_hidden = jnp.repeat(hidden, BEAMS, axis=0)
        tiled_mask = jnp.repeat(enc_mask, BEAMS, axis=0)
        cache = model.apply(variables, BK, MAXLEN, tiled_hidden,
                            method=Seq2SeqModel.init_cache)
        step = functools.partial(model.apply, variables,
                                 method=Seq2SeqModel.decode_step)
        tokens0 = jnp.ones((BK, 1), jnp.int32)

        def body(t, carry):
            tokens, selves, acc = carry
            logits, new_cache = step(
                tokens, t, {"self": selves, "cross": cache["cross"]}, tiled_mask
            )
            tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return tokens, new_cache["self"], acc + logits.sum()

        _, _, acc = jax.lax.fori_loop(
            0, STEPS, body, (tokens0, cache["self"], jnp.float32(0)))
        return acc

    secs = _time(f, variables, batch["encoder_inputs"], batch["encoder_mask"])
    _report("decode_only", secs, bytes_per_step=CACHE_BYTES)


def _run_gather(name, gather_fn):
    caches = make_caches(jax.random.PRNGKey(1))
    idx = jax.random.randint(jax.random.PRNGKey(2), (BATCH, BEAMS), 0, BEAMS)

    @_scalarize
    def f(caches, idx):
        def body(t, caches):
            return gather_fn(caches, (idx + t) % BEAMS)

        return jax.lax.fori_loop(0, STEPS, body, caches)

    # gather traffic = read + write the full cache
    secs = _time(f, caches, idx)
    _report(name, secs, bytes_per_step=2 * CACHE_BYTES)


def gather_5d(caches, indices):
    perm = jax.nn.one_hot(indices, BEAMS, dtype=caches[0].dtype)

    def g(cache):
        two, bk, length, d = cache.shape
        unflat = cache.reshape(two, BATCH, BEAMS, length, d)
        picked = jnp.einsum("bnk,cbkld->cbnld", perm, unflat,
                            preferred_element_type=cache.dtype)
        return picked.reshape(two, bk, length, d)

    return [g(c) for c in caches]


def gather_bmm(caches, indices):
    perm = jax.nn.one_hot(indices, BEAMS, dtype=caches[0].dtype)

    def g(cache):
        two, bk, length, d = cache.shape
        # (B, K, 2*L*D) with k contiguous-major over the flattened payload:
        # original layout (2, B, K, L, D) -> transpose to (B, K, 2, L, D)
        unflat = cache.reshape(two, BATCH, BEAMS, length, d)
        moved = unflat.transpose(1, 2, 0, 3, 4).reshape(BATCH, BEAMS, -1)
        picked = jnp.einsum("bnk,bkm->bnm", perm, moved,
                            preferred_element_type=cache.dtype)
        return (picked.reshape(BATCH, BEAMS, two, length, d)
                .transpose(2, 0, 1, 3, 4).reshape(two, bk, length, d))

    return [g(c) for c in caches]


def gather_taa(caches, indices):
    def g(cache):
        two, bk, length, d = cache.shape
        unflat = cache.reshape(two, BATCH, BEAMS, length, d)
        picked = jnp.take_along_axis(
            unflat, indices[None, :, :, None, None], axis=2)
        return picked.reshape(two, bk, length, d)

    return [g(c) for c in caches]


def run_bookkeep():
    @_scalarize
    def f(key):
        logits = jax.random.normal(key, (BK, VOCAB), jnp.float32)
        live_seqs = jnp.zeros((BATCH, BEAMS, MAXLEN), jnp.int32)
        live_scores = jnp.zeros((BATCH, BEAMS), jnp.float32)
        fin_seqs = jnp.zeros((BATCH, BEAMS, MAXLEN), jnp.int32)
        fin_scores = jnp.full((BATCH, BEAMS), -1e7, jnp.float32)

        def body(t, carry):
            live_seqs, live_scores, fin_seqs, fin_scores = carry
            logprobs = jax.nn.log_softmax(logits).reshape(BATCH, BEAMS, VOCAB)
            total = live_scores[:, :, None] + logprobs
            flat = total.reshape(BATCH, BEAMS * VOCAB)
            topk_scores, topk_idx = jax.lax.top_k(flat, 2 * BEAMS)
            topk_beam = topk_idx // VOCAB
            topk_token = topk_idx % VOCAB
            cand = jnp.take_along_axis(
                live_seqs, topk_beam[:, :, None], axis=1
            ).at[:, :, t + 1].set(topk_token)
            is_eos = topk_token == 2
            cand_fin = jnp.where(is_eos, topk_scores, -1e7)
            m_scores = jnp.concatenate([fin_scores, cand_fin], axis=1)
            m_seqs = jnp.concatenate([fin_seqs, cand], axis=1)
            fin_scores, fi = jax.lax.top_k(m_scores, BEAMS)
            fin_seqs = jnp.take_along_axis(m_seqs, fi[:, :, None], axis=1)
            live_cand = jnp.where(is_eos, -1e7, topk_scores)
            live_scores, li = jax.lax.top_k(live_cand, BEAMS)
            live_seqs = jnp.take_along_axis(cand, li[:, :, None], axis=1)
            return live_seqs, live_scores, fin_seqs, fin_scores

        return jax.lax.fori_loop(
            0, STEPS, body, (live_seqs, live_scores, fin_seqs, fin_scores))

    _report("bookkeep", _time(f, jax.random.PRNGKey(3)))


def run_beam_full():
    model, variables, batch = _model_and_batch()
    from multimodalanalytical_tpu.generation.beam_search import beam_search

    @_scalarize
    def f(variables, enc, mask):
        return beam_search(model, variables, enc, mask, num_beams=BEAMS,
                           max_length=MAXLEN)

    secs = _time(f, variables, batch["encoder_inputs"], batch["encoder_mask"])
    _report("beam_full", secs, bytes_per_step=3 * CACHE_BYTES)


def run_greedy():
    model, variables, batch = _model_and_batch()
    from multimodalanalytical_tpu.generation.beam_search import beam_search

    @_scalarize
    def f(variables, enc, mask):
        return beam_search(model, variables, enc, mask, num_beams=1,
                           max_length=MAXLEN)

    secs = _time(f, variables, batch["encoder_inputs"], batch["encoder_mask"])
    _report("greedy", secs, bytes_per_step=CACHE_BYTES // BEAMS)


VARIANTS = {
    "loop_noop": run_loop_noop,
    "decode_only": run_decode_only,
    "gather_5d": lambda: _run_gather("gather_5d", gather_5d),
    "gather_bmm": lambda: _run_gather("gather_bmm", gather_bmm),
    "gather_taa": lambda: _run_gather("gather_taa", gather_taa),
    "bookkeep": run_bookkeep,
    "beam_full": run_beam_full,
    "greedy": run_greedy,
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    print(f"device={jax.devices()[0]}  B={BATCH} K={BEAMS} L={MAXLEN} "
          f"d={D_MODEL} layers={LAYERS} vocab={VOCAB}  "
          f"cache={CACHE_BYTES/1e9:.2f} GB/step mandatory")
    for name in names:
        VARIANTS[name]()



def run_copy_probe():
    """Raw streaming bandwidth: read+write the full cache once per step."""
    caches = make_caches(jax.random.PRNGKey(4))

    @_scalarize
    def f(caches):
        def body(t, caches):
            return [c + jnp.bfloat16(1.0) for c in caches]
        return jax.lax.fori_loop(0, STEPS, body, caches)

    secs = _time(f, caches)
    _report("copy_probe", secs, bytes_per_step=2 * CACHE_BYTES)


def run_copy_single():
    """Same traffic, one fused (L6,2,BK,L,D) buffer instead of a 6-list."""
    big = jax.random.normal(jax.random.PRNGKey(5),
                            (LAYERS, 2, BK, MAXLEN, D_MODEL), jnp.bfloat16)

    @_scalarize
    def f(big):
        def body(t, big):
            return big + jnp.bfloat16(1.0)
        return jax.lax.fori_loop(0, STEPS, body, big)

    secs = _time(f, big)
    _report("copy_single", secs, bytes_per_step=2 * CACHE_BYTES)


def run_copy_nolup():
    """One unjitted-loop step: jit(x+1) called 127 times from host."""
    big = jax.random.normal(jax.random.PRNGKey(6),
                            (LAYERS, 2, BK, MAXLEN, D_MODEL), jnp.bfloat16)
    g = jax.jit(lambda x: x + jnp.bfloat16(1.0), donate_argnums=0)
    big = g(big)
    jax.device_get(big[0, 0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        big = g(big)
    jax.device_get(big[0, 0, 0, 0, 0])
    secs = time.perf_counter() - t0
    _report("copy_nolup", secs, bytes_per_step=2 * CACHE_BYTES)


VARIANTS["copy_probe"] = run_copy_probe
VARIANTS["copy_single"] = run_copy_single
VARIANTS["copy_nolup"] = run_copy_nolup



def run_lazy_pieces():
    """Decompose the lazy beam self-attention into its einsum pieces.

    Shapes mirror beam_decode_self_attention at flagship scale: cache
    (2, L, B, K, D) bf16 per layer x6, q (B, K, H, Dh), ancestry one-hot
    (B, K, L, K) fp32.
    """
    H, DH = 8, D_MODEL // 8
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 4)
    caches = [jax.random.normal(k, (2, MAXLEN, BATCH, BEAMS, D_MODEL),
                                jnp.bfloat16)
              for k in jax.random.split(ks[0], LAYERS)]
    q = jax.random.normal(ks[1], (BATCH, BEAMS, H, DH), jnp.bfloat16)
    anc = jax.random.randint(ks[2], (BATCH, BEAMS, MAXLEN), 0, BEAMS)

    def qk_and_pv(cache, onehot, acc, t):
        # write this step's row (like real decode) so the loop body is NOT
        # loop-invariant (XLA would hoist it entirely otherwise)
        new_row = jnp.broadcast_to(
            acc.astype(jnp.bfloat16), (2, 1, BATCH, BEAMS, D_MODEL))
        cache = jax.lax.dynamic_update_slice(cache, new_row, (0, t, 0, 0, 0))
        kv = cache.reshape(2, MAXLEN, BATCH, BEAMS, H, DH)
        qk_all = jnp.einsum("bnhd,lbkhd->bnhkl", q, kv[0],
                            preferred_element_type=jnp.float32)
        logits = jnp.einsum("bnhkl,bnlk->bnhl", qk_all, onehot)
        probs = jax.nn.softmax(logits, axis=-1)
        pw = jnp.einsum("bnhl,bnlk->bnhlk", probs.astype(jnp.bfloat16),
                        onehot.astype(jnp.bfloat16))
        out = jnp.einsum("bnhlk,lbkhd->bnhd", pw, kv[1],
                         preferred_element_type=jnp.float32)
        return acc + out.sum(), cache

    @_scalarize
    def full(caches, anc):
        def body(t, carry):
            acc, caches = carry
            onehot = ((anc + t) % BEAMS == jnp.arange(BEAMS)[None, None, None, :]
                      if False else
                      ((anc[:, :, :, None] + t) % BEAMS ==
                       jnp.arange(BEAMS)[None, None, None, :])).astype(jnp.float32)
            new_caches = []
            for i, c in enumerate(caches):
                acc, c = qk_and_pv(c, onehot, acc, t)
                new_caches.append(c)
            return acc, new_caches
        acc, _ = jax.lax.fori_loop(0, STEPS, body, (jnp.float32(0), caches))
        return acc

    secs = _time(full, caches, anc)
    _report("lazy_attn6", secs, bytes_per_step=CACHE_BYTES)

    def qk_only(cache, acc, t):
        new_row = jnp.broadcast_to(
            acc.astype(jnp.bfloat16), (2, 1, BATCH, BEAMS, D_MODEL))
        cache = jax.lax.dynamic_update_slice(cache, new_row, (0, t, 0, 0, 0))
        kv = cache.reshape(2, MAXLEN, BATCH, BEAMS, H, DH)
        qk_all = jnp.einsum("bnhd,lbkhd->bnhkl", q, kv[0],
                            preferred_element_type=jnp.float32)
        return acc + qk_all.sum(), cache

    @_scalarize
    def qk(caches):
        def body(t, carry):
            acc, caches = carry
            new_caches = []
            for c in caches:
                acc, c = qk_only(c, acc, t)
                new_caches.append(c)
            return acc, new_caches
        acc, _ = jax.lax.fori_loop(0, STEPS, body, (jnp.float32(0), caches))
        return acc

    secs = _time(qk, caches)
    _report("lazy_qk6", secs, bytes_per_step=CACHE_BYTES // 2)

    def sel_only(onehot, acc, qk_all):
        logits = jnp.einsum("bnhkl,bnlk->bnhl", qk_all, onehot)
        probs = jax.nn.softmax(logits, axis=-1)
        pw = jnp.einsum("bnhl,bnlk->bnhlk", probs.astype(jnp.bfloat16),
                        onehot.astype(jnp.bfloat16))
        return acc + pw.sum().astype(jnp.float32)

    qk_const = jax.random.normal(ks[3], (BATCH, BEAMS, H, BEAMS, MAXLEN),
                                 jnp.float32)

    @_scalarize
    def sel(anc, qk_all):
        def body(t, acc):
            onehot = ((anc[:, :, :, None] + t) % BEAMS ==
                      jnp.arange(BEAMS)[None, None, None, :]).astype(jnp.float32)
            for _ in range(LAYERS):
                acc = sel_only(onehot, acc, qk_all + acc)
            return acc
        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0))

    secs = _time(sel, anc, qk_const)
    _report("lazy_sel6", secs)


VARIANTS["lazy_pieces"] = run_lazy_pieces



def run_kernel_only(length=MAXLEN, label="kernel_only"):
    """Isolate the fused pallas kernel: 6 calls per step in a fori_loop."""
    from multimodalanalytical_tpu.ops.beam_attention import (
        beam_select_attention,
    )

    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    caches = [jax.random.normal(k, (2, BATCH, length * BEAMS, D_MODEL),
                                jnp.bfloat16)
              for k in jax.random.split(ks[0], LAYERS)]
    q = jax.random.normal(ks[1], (BATCH, BEAMS, D_MODEL), jnp.bfloat16)
    anc = jax.random.randint(ks[2], (BATCH, BEAMS, length), 0, BEAMS)

    @_scalarize
    def f(caches, q, anc):
        def body(t, carry):
            acc, q = carry
            pos = jnp.minimum(t, length - 1)
            for c in caches:
                out = beam_select_attention(q, c, anc, pos, 8)
                acc = acc + out.sum()
                q = out  # serialize layers like the real decoder
            return acc, q
        acc, _ = jax.lax.fori_loop(0, STEPS, body, (jnp.float32(0), q))
        return acc

    bytes_per_step = LAYERS * 2 * BATCH * BEAMS * length * D_MODEL * 2
    secs = _time(f, caches, q, anc)
    _report(label, secs, bytes_per_step=bytes_per_step)


def run_beam_nostage():
    model, variables, batch = _model_and_batch()
    from multimodalanalytical_tpu.generation.beam_search import beam_search

    @_scalarize
    def f(variables, enc, mask):
        return beam_search(model, variables, enc, mask, num_beams=BEAMS,
                           max_length=MAXLEN, stage_size=None)

    secs = _time(f, variables, batch["encoder_inputs"], batch["encoder_mask"])
    _report("beam_nostage", secs, bytes_per_step=CACHE_BYTES)


VARIANTS["kernel_only"] = run_kernel_only
VARIANTS["kernel_only32"] = lambda: run_kernel_only(32, "kernel_only32")
VARIANTS["beam_nostage"] = run_beam_nostage


def run_kernel_only_q8(length=MAXLEN, label="kernel_q8"):
    """Isolate the fused kernel with the int8 cache (half the HBM bytes)."""
    from multimodalanalytical_tpu.ops.beam_attention import (
        beam_select_attention,
    )

    H = 8
    ks = jax.random.split(jax.random.PRNGKey(10), 5)
    caches = [
        jax.random.randint(k, (2, BATCH, length * BEAMS, D_MODEL),
                           -127, 128, jnp.int8)
        for k in jax.random.split(ks[0], LAYERS)
    ]
    scales = [
        jax.random.uniform(k, (2, BATCH, H, length * BEAMS), jnp.float32,
                           0.005, 0.02)
        for k in jax.random.split(ks[3], LAYERS)
    ]
    q = jax.random.normal(ks[1], (BATCH, BEAMS, D_MODEL), jnp.bfloat16)
    anc = jax.random.randint(ks[2], (BATCH, BEAMS, length), 0, BEAMS)

    @_scalarize
    def f(caches, scales, q, anc):
        def body(t, carry):
            acc, q = carry
            pos = jnp.minimum(t, length - 1)
            for c, s in zip(caches, scales):
                out = beam_select_attention(q, c, anc, pos, H, scales=s)
                acc = acc + out.sum()
                q = out
            return acc, q
        acc, _ = jax.lax.fori_loop(0, STEPS, body, (jnp.float32(0), q))
        return acc

    bytes_per_step = LAYERS * 2 * BATCH * BEAMS * length * (D_MODEL + H * 4)
    secs = _time(f, caches, scales, q, anc)
    _report(label, secs, bytes_per_step=bytes_per_step)


def run_stepops():
    """The full beam search with self-attention stubbed out (cache write +
    identity): everything EXCEPT the kernel — projections, cross-attn, FFN,
    lm_head, bookkeeping, loop."""
    from multimodalanalytical_tpu.ops.attention import MultiHeadAttention

    orig = MultiHeadAttention.beam_decode_self_attention

    def stub(self, x, cache_kv, ancestry, position, extra_bias=None):
        batch, beams = ancestry.shape[0], ancestry.shape[1]
        q_flat, k_new, v_new = self._qkv(x)          # (B*K, D) flat
        new_rows = jnp.stack([
            k_new.reshape(batch, beams, -1), v_new.reshape(batch, beams, -1)
        ])
        store = cache_kv["data"] if isinstance(cache_kv, dict) else cache_kv
        store = jax.lax.dynamic_update_slice(
            store, new_rows.astype(store.dtype), (0, 0, position * beams, 0))
        if isinstance(cache_kv, dict):
            cache_kv = dict(cache_kv, data=store)
        else:
            cache_kv = store
        return self.out_proj(q_flat), cache_kv

    MultiHeadAttention.beam_decode_self_attention = stub
    try:
        model, variables, batch = _model_and_batch()
        from multimodalanalytical_tpu.generation.beam_search import beam_search

        @_scalarize
        def f(variables, enc, mask):
            return beam_search(model, variables, enc, mask, num_beams=BEAMS,
                               max_length=MAXLEN)

        secs = _time(f, variables, batch["encoder_inputs"],
                     batch["encoder_mask"])
        _report("stepops", secs)
    finally:
        MultiHeadAttention.beam_decode_self_attention = orig


def run_beam_full_q8(stage=32, label="beam_full_q8"):
    import dataclasses

    model, variables, batch = _model_and_batch()
    model = dataclasses.replace(model, config=dataclasses.replace(
        model.config, kv_cache_dtype="int8"))
    from multimodalanalytical_tpu.generation.beam_search import beam_search

    @_scalarize
    def f(variables, enc, mask):
        return beam_search(model, variables, enc, mask, num_beams=BEAMS,
                           max_length=MAXLEN, stage_size=stage)

    secs = _time(f, variables, batch["encoder_inputs"], batch["encoder_mask"])
    _report(label, secs, bytes_per_step=CACHE_BYTES // 2)


VARIANTS["kernel_q8"] = run_kernel_only_q8
VARIANTS["kernel_q8_32"] = lambda: run_kernel_only_q8(32, "kernel_q8_32")
VARIANTS["stepops"] = run_stepops
VARIANTS["beam_full_q8"] = run_beam_full_q8
VARIANTS["beam_full_q8_s16"] = lambda: run_beam_full_q8(16, "beam_full_q8_s16")

if __name__ == "__main__":
    main()
