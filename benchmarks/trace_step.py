"""Capture a device trace of one profiled variant and attribute op time.

Wraps `benchmarks/profile_train.py` / `profile_decode.py` workloads in
`jax.profiler.trace`, then parses the resulting `trace.json.gz` and prints
the top XLA ops by total device time, grouped by fusion-name prefix. Used to
drive the MFU work in PROFILE.md (the round-3/4 trace parsing was ad hoc;
this commits the tool).

Usage:
    python benchmarks/trace_step.py train_full    # full train step
    python benchmarks/trace_step.py train_fwdbwd  # fwd+bwd only
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _parse_trace(trace_dir: str, reps: int):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace found under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    # Leaf op events live on the "XLA Ops" thread of the device pid;
    # "Steps"/"XLA Modules" threads double-count.
    tids = {}
    for ev in data["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tids[(ev["pid"], ev.get("tid"))] = ev["args"].get("name")

    groups = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in data["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        if tids.get((ev["pid"], ev.get("tid"))) != "XLA Ops":
            continue
        bucket = _bucket(ev.get("name", ""))
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        groups[bucket] += dur
        counts[bucket] += 1
        total += dur

    if not groups:
        print("no 'XLA Ops' events found; thread names present:")
        for k, v in sorted(set(tids.items()))[:20]:
            print("  ", k, v)
        return
    print(f"device op total {total:.2f} ms over {reps} reps "
          f"= {total / reps:.3f} ms/step")
    for bucket, ms in sorted(groups.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms / reps:8.4f} ms/step  {100 * ms / total:5.1f}%  "
              f"x{counts[bucket] // max(reps, 1):5d}  {bucket}")


def _bucket(name: str) -> str:
    """Group fusion instances: strip trailing .N instance suffixes."""
    return re.sub(r"\.\d+$", "", name)


def _analyze_copies(txt: str) -> None:
    """Group the copy instructions in compiled HLO text by shape, and print
    each shape's top producers (the operand's defining instruction) so the
    copies can be attributed to model code."""
    import math
    from collections import Counter, defaultdict

    dsize = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
             "f16": 2, "u8": 1, "s64": 8}
    defs = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(%?[\w.\-]+)\s*=", line)
        if m:
            defs[m.group(1)] = line.strip()
    by_shape = Counter()
    producers = defaultdict(Counter)
    copy_re = re.compile(r"(\S+)\s*=\s*(\w+)\[([\d,]*)\][^ ]*\s+copy\((\S+?)[,)]")
    for m in copy_re.finditer(txt):
        dtype, shape, operand = m.group(2), m.group(3), m.group(4)
        dims = [int(x) for x in shape.split(",") if x]
        nbytes = math.prod(dims) * dsize.get(dtype, 4) if dims else 4
        key = f"{dtype}[{shape}]"
        by_shape[key] += nbytes
        op_def = defs.get(operand, "?")
        kind = re.search(r"=\s*[\w\[\],{}#* ]+?\s(\w[\w\-]*)\(", op_def)
        producers[key][kind.group(1) if kind else "?"] += 1
    total = sum(by_shape.values())
    print(f"total copy bytes: {total / 1e6:.0f} MB")
    for key, nbytes in by_shape.most_common(15):
        prods = ", ".join(f"{k}x{v}" for k, v in producers[key].most_common(3))
        print(f"  {nbytes / 1e6:8.1f} MB  {key:24s} from: {prods}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "train_full"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import benchmarks.profile_train as pt

    model, params, opt, opt_state, batch = pt._setup()
    rng = jax.random.PRNGKey(2)

    def loss_fn(p, drop_rng):
        out = model.apply(
            {"params": p}, batch["encoder_inputs"], batch["encoder_mask"],
            batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
            deterministic=False, rngs={"dropout": drop_rng},
        )
        return out["loss"]

    def _rbg(r):
        return jax.random.wrap_key_data(
            jax.random.key_data(jax.random.split(r, 2)).reshape(4)
            .astype(jnp.uint32), impl="rbg")

    if which == "train_full":
        @jax.jit
        def step(p, s, r):
            loss, grads = jax.value_and_grad(
                lambda q: loss_fn(q, _rbg(r)))(p)
            updates, s = opt.update(grads, s, p)
            p = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
            return loss, p, s

        def run():
            nonlocal params, opt_state
            loss = None
            for _ in range(reps):
                loss, params, opt_state = step(params, opt_state, rng)
            return loss
    elif which == "train_fwdbwd":
        @jax.jit
        def step(p, r):
            loss, grads = jax.value_and_grad(
                lambda q: loss_fn(q, _rbg(r)))(p)
            return loss, jax.tree_util.tree_map(lambda g: g.sum(), grads)

        def run():
            loss = None
            for _ in range(reps):
                loss, _ = step(params, rng)
            return loss
    elif which == "train_hlo":
        def step(p, s, r):
            loss, grads = jax.value_and_grad(
                lambda q: loss_fn(q, _rbg(r)))(p)
            updates, s = opt.update(grads, s, p)
            p = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
            return loss, p, s

        txt = jax.jit(step, donate_argnums=(0, 1)).lower(
            params, opt_state, rng).compile().as_text()
        _analyze_copies(txt)
        return
    else:
        raise SystemExit(f"unknown variant {which}")

    # Warm up / compile outside the trace.
    out = run()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    trace_dir = "/tmp/trace_step"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        out = run()
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    _parse_trace(trace_dir, reps)


if __name__ == "__main__":
    main()
