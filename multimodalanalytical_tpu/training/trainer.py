"""Training orchestration: jitted sharded train/eval/decode + epoch loop.

Replaces the reference's Lightning wrapper + Trainer
(reference modeling/wrapper.py:230-655, trainer/trainer.py:9-73):

  * one jitted train step (loss + grads + optax update) compiled once over
    static shapes, GSPMD-sharded over the device mesh;
  * OneCycle LR (reference wrapper.py:340-344) via optax;
  * gradient accumulation via optax.MultiSteps (reference acc_batches);
  * modality dropout *in-graph* as attention-mask zeroing — numerically
    equivalent to the reference's input removal (wrapper.py:367-386) but
    shape-stable under jit;
  * per-epoch validation: loss, token accuracy, greedy-decode Top-1
    molecular accuracy (reference wrapper.py:491-525);
  * checkpoints via orbax (training/checkpoint.py).
"""

from __future__ import annotations

import logging
import math
import time
from collections import deque
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..data.tokenizer import RegexTokenizer
from ..evaluation.metrics import calc_sampling_metrics
from ..generation.beam_search import beam_search
from ..models.seq2seq import Seq2SeqModel
from ..parallel.mesh import make_mesh, replicated, shard_batch
from ..parallel.multihost import is_main, local_rows, sum_across_processes
from .checkpoint import CheckpointManager
from .loader import DataLoader

logger = logging.getLogger(__name__)

# Validate/predict dispatch-ahead depth: how many batches' device outputs
# (beam ids + a scalar loss each) may be in flight before the oldest is
# fetched and scored. 8 keeps the axon relay (~40 ms/synchronized
# round-trip) saturated while bounding pinned device memory on uncapped
# loaders (VERDICT r3 item 7).
PIPELINE_DEPTH = 8


def _retry_resource_exhausted(fn, what: str, attempts: int = 3,
                              wait_s: float = 10.0):
    """Run ``fn`` with a bounded retry on RESOURCE_EXHAUSTED.

    The axon relay intermittently fails a ~MB-scale host->device transfer
    with a bare ``TPU backend error (ResourceExhausted)`` even when steady-
    state HBM use is far below capacity (driver-round 4: a 40M-sample run
    died at step 30k on the device_put of a routine train batch, after 30k
    identical transfers). A genuine OOM fails all retries and re-raises;
    a transient allocator/relay spike costs ``wait_s`` instead of a
    multi-hour run. gc between tries drops any Python-held buffer handles
    whose deletes have not yet reached the relay.
    """
    import gc

    for attempt in range(attempts):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as exc:
            if "RESOURCE_EXHAUSTED" not in str(exc) or attempt == attempts - 1:
                raise
            logger.warning(
                "RESOURCE_EXHAUSTED during %s (attempt %d/%d); gc + %.0fs "
                "backoff before retry", what, attempt + 1, attempts, wait_s)
            gc.collect()
            time.sleep(wait_s)

OPTIMISER_REGISTRY = {"adam": optax.adam, "adamw": optax.adamw}


def calculate_training_steps(
    train_len: int, batch_size: int, acc_batches: int, epochs: int
) -> int:
    """Optimizer updates over the run (reference utils.py:156-172)."""
    batches = math.ceil(train_len / batch_size)
    return math.ceil(batches / acc_batches) * epochs


def build_optimizer(
    optimiser: str,
    lr: float,
    num_steps: int,
    weight_decay: float = 0.0,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    clip_grad: float = 1.0,
    acc_batches: int = 1,
) -> optax.GradientTransformation:
    """clip -> adam/adamw with OneCycle schedule -> accumulation."""
    # optax's cosine_onecycle_schedule returns NaN for transition_steps <= 3
    # with pct_start=0.3: the warmup boundary int(0.3 * steps) is 0 and the
    # linear segment divides by it. Seen as all-NaN params after ONE update
    # on runs with trivially few steps (the e2e test fixture); floor the
    # horizon so the warmup segment is always >= 1 step.
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(num_steps, 4), peak_value=lr,
        pct_start=0.3, div_factor=25.0, final_div_factor=1e4,
    )
    if optimiser == "adamw":
        base = optax.adamw(schedule, b1=adam_beta1, b2=adam_beta2,
                           weight_decay=weight_decay)
    else:
        base = optax.adam(schedule, b1=adam_beta1, b2=adam_beta2)
    tx = optax.chain(optax.clip_by_global_norm(clip_grad), base)
    if acc_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=acc_batches)
    return tx


class TrainState(train_state.TrainState):
    dropout_rng: jax.Array = None


def _device_batch(batch: Dict[str, Any],
                  compute_dtype=None) -> Dict[str, Any]:
    """Strip host-only fields; keep the jit-able pytree.

    ``compute_dtype=jnp.bfloat16``: float32 ENCODER INPUT leaves are cast
    to bfloat16 on the host before the transfer. This is numerically
    IDENTICAL to shipping float32 — every consumer is a
    ``Dense(dtype=bfloat16)`` patch/feature projection that casts its input
    in-graph anyway (models/embedding.py) and the host cast uses the same
    round-to-nearest-even — but it halves the dominant host->device bytes
    (an IR patch batch is ~0.9 MB/step of float32; the axon relay moves
    ~35 MB/s, so real epochs were input-transfer-bound, PROFILE.md round
    5). XVal ``numerical_values`` stay float32: they multiply the bf16
    embedding under f32 promotion (embedding.py:114-115). ``align_target``
    stays float32 (f32 alignment loss).
    """
    keep = {"encoder_inputs", "encoder_mask", "decoder_ids", "decoder_mask",
            "labels", "align_target",
            # Device-mixture index batches (data/device_mixture.py): tiny
            # int/bool sampling decisions expanded in-graph by the trainer's
            # batch_transform.
            "mix_idx", "comp_slot", "mix_weights", "mix_normalize",
            "row_valid"}
    out = {k: v for k, v in batch.items() if k in keep}
    if compute_dtype != jnp.bfloat16 or "encoder_inputs" not in out:
        return out
    import ml_dtypes

    def compress(modality_value):
        def cast(key, leaf):
            if (key != "numerical_values" and hasattr(leaf, "dtype")
                    and leaf.dtype == np.float32):
                return np.asarray(leaf).astype(ml_dtypes.bfloat16)
            return leaf
        if isinstance(modality_value, dict):
            return {k: cast(k, v) for k, v in modality_value.items()}
        return cast("", modality_value)

    out["encoder_inputs"] = {
        m: compress(v) for m, v in out["encoder_inputs"].items()
    }
    return out


def _modality_segments(
    encoder_inputs: Dict[str, Any],
    order: Optional[Sequence[str]] = None,
) -> List[Tuple[str, int, int]]:
    """(modality, start, end) over the concatenated source axis.

    ``order``: canonical modality order (the data config's); REQUIRED
    whenever the dict may have passed through a jit/pytree boundary, which
    canonicalizes dict keys to sorted order and would misattribute segments.
    """
    segments = []
    offset = 0
    names = [m for m in (order or encoder_inputs) if m in encoder_inputs]
    for modality in names:
        value = encoder_inputs[modality]
        if isinstance(value, dict):
            length = value["tokenized_input"].shape[1]
        else:
            length = value.shape[1]
        segments.append((modality, offset, offset + length))
        offset += length
    return segments


class Trainer:
    def __init__(
        self,
        model: Seq2SeqModel,
        target_tokenizer: RegexTokenizer,
        optimiser: str = "adam",
        lr: float = 1e-3,
        weight_decay: float = 0.0,
        adam_beta1: float = 0.9,
        adam_beta2: float = 0.999,
        num_steps: int = 1000,
        acc_batches: int = 1,
        clip_grad: float = 1.0,
        modality_dropout: Optional[Sequence[str]] = None,
        mesh=None,
        seed: int = 0,
        n_beams: int = 10,
        monitor: str = "val_molecular_accuracy",
        checkpoint_every_n_vals: int = 1,
        checkpoint_wait_timeout_s: float = 600.0,
        batch_transform=None,
    ):
        """``batch_transform``: optional ``(fn, consts)`` pair applied to a
        batch INSIDE the jitted train step when the batch is an index batch
        (has "mix_idx"); regular batches pass through untouched. ``fn(
        consts, batch)`` receives ``consts`` (committed device arrays, e.g.
        the device-mixture pool) as an explicit jit ARGUMENT every step —
        closing over a concrete array would inline it into the lowered HLO
        as a literal (a 295 MB pool measured 547 MB of module text and
        wedged the remote-compile service). Used by the device-mixture fast
        path (data/device_mixture.py); validation/predict loaders stay on
        the host path and never carry index batches."""
        self.model = model
        self.tokenizer = target_tokenizer
        lr = float(lr)
        weight_decay = float(weight_decay)
        self.modality_dropout = list(modality_dropout or [])
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = seed
        self.n_beams = n_beams
        # Early stopping monitors the same metric as checkpointing
        # (reference trainer.py:39-46 uses the checkpoint monitor for both);
        # "loss"-style monitors improve downwards.
        self.monitor = monitor
        self.monitor_mode = "min" if "loss" in monitor else "max"
        # Checkpoint cadence: a full save moves params + optimizer state
        # (~0.6 GB at flagship scale) from device to disk — on the axon
        # tunnel that costs ~45 s, dwarfing a 1-2 s epoch. Saves happen when
        # the monitored metric improves and otherwise only every N-th
        # validation (N=1 reproduces the reference's every-epoch cadence).
        self.checkpoint_every_n_vals = max(int(checkpoint_every_n_vals), 1)
        # Bound on end-of-fit save drains; ~13x the observed ~45 s D2H cost
        # of one full save, far below the infinite hang a relay wedge causes.
        self.checkpoint_wait_timeout_s = float(checkpoint_wait_timeout_s)
        self._val_count = 0
        self._last_improvement_save = -10**9
        # Step whose full state was last persisted (``last`` freshness
        # tracking for the max_steps terminal save, ADVICE r4).
        self._saved_state_step = -1
        # (step, device-snapshot tree, metrics) of an improvement whose save
        # was rate-suppressed; flushed by the next due save / end of fit.
        self._pending_best = None
        # Async train-metric logging (see _log_async). _log_dead flips when
        # a drain times out (wedged fetch thread): logging then disables
        # itself for the rest of the fit instead of hanging it.
        self._log_queue = None
        self._log_dead = False
        self.tx = build_optimizer(
            optimiser, lr, num_steps, weight_decay, adam_beta1, adam_beta2,
            clip_grad, acc_batches,
        )
        self._train_step = None
        self._eval_step = None
        self._decode_fns: Dict[Tuple, Any] = {}
        if batch_transform is not None:
            self._transform_fn, self._transform_consts = batch_transform
        else:
            self._transform_fn, self._transform_consts = None, {}

    def _maybe_expand(self, batch: Dict[str, Any],
                      consts: Dict[str, Any]) -> Dict[str, Any]:
        """Expand a device-mixture index batch to the full collated batch.
        A Python structural check: jit retraces per batch structure, so
        regular batches never pay the branch. ``consts`` must be the traced
        jit argument, never ``self._transform_consts`` directly inside a
        jitted function (closure constants inline into the HLO)."""
        if self._transform_fn is not None and "mix_idx" in batch:
            return self._transform_fn(consts, batch)
        return batch

    # ------------------------------------------------------------- init
    def init_state(self, sample_batch: Dict[str, Any]) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        init_rng, dropout_rng = jax.random.split(rng)
        batch = _device_batch(sample_batch, self.model.config.compute_dtype)
        if self._transform_fn is not None and "mix_idx" in batch:
            batch = jax.jit(self._transform_fn)(self._transform_consts, batch)
        variables = self.model.init(
            {"params": init_rng, "dropout": dropout_rng},
            batch["encoder_inputs"], batch["encoder_mask"],
            batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
            batch.get("align_target"), deterministic=True,
        )
        params = variables["params"]
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        logger.info("Initialized model with %.2fM parameters", n_params / 1e6)
        state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=self.tx,
            dropout_rng=dropout_rng,
        )
        # Replicate across the mesh.
        return jax.device_put(state, replicated(self.mesh))

    def state_with_params(self, state: TrainState, params) -> TrainState:
        state = state.replace(
            params=jax.device_put(params, replicated(self.mesh)))
        self._flush_transfers(state.params)
        return state

    def _flush_transfers(self, tree) -> None:
        """Force-complete pending host->device uploads of ``tree``.

        Checkpoint restores enqueue ~0.6 GB of lazy uploads; on the axon
        relay, letting them drain CONCURRENTLY with fit's dispatch stream
        and the async metric fetches wedged the client twice in a row
        (round 5: both finetune folds hung in the log worker's first
        scalar fetch while from-scratch folds — no restore in flight —
        sailed). device_get of an in-graph scalar is the reliable sync on
        axon (block_until_ready can return early) and moves 4 bytes where
        fetching a leaf would move megabytes; transfers are queued in
        order on the single client, so one scalar dispatched after the
        uploads flushes them all."""
        leaves = jax.tree_util.tree_leaves(tree)
        if leaves:
            jax.device_get(
                (jnp.sum(leaves[0]) + jnp.sum(leaves[-1])).astype(
                    jnp.float32))

    # ------------------------------------------------------------ steps
    def _build_train_step(self, segments: List[Tuple[str, int, int]]):
        droppable = [
            (start, end) for (m, start, end) in segments
            if m in self.modality_dropout
        ]

        def apply_modality_dropout(rng, encoder_mask):
            if not droppable:
                return encoder_mask
            k_rng, perm_rng = jax.random.split(rng)
            n = len(droppable)
            # k in [0, n): never drops every listed modality
            # (reference wrapper.py:369-372).
            k = jax.random.randint(k_rng, (), 0, n)
            order = jax.random.permutation(perm_rng, n)
            mask = encoder_mask
            for i, (start, end) in enumerate(droppable):
                dropped = order[i] < k
                seg = mask[:, start:end] * jnp.where(dropped, 0, 1)
                mask = jax.lax.dynamic_update_slice(mask, seg, (0, start))
            return mask

        def train_step(state: TrainState, batch: Dict[str, Any],
                       transform_consts: Optional[Dict[str, Any]] = None):
            batch = self._maybe_expand(batch, transform_consts)
            step_rng = jax.random.fold_in(state.dropout_rng, state.step)
            drop_rng, modality_rng = jax.random.split(step_rng)
            # Dropout masks draw ~10^8 random bits/step; threefry generation
            # measured at 12.4 ms/step on v5e (benchmarks/profile_train.py).
            # Re-key the dropout stream through the rbg generator (~10x
            # cheaper bits); the carried state stays a plain threefry key so
            # checkpoints and determinism per (seed, step) are unchanged.
            drop_rng = jax.random.wrap_key_data(
                jax.random.key_data(
                    jax.random.split(drop_rng, 2)
                ).reshape(4).astype(jnp.uint32),
                impl="rbg",
            )
            encoder_mask = apply_modality_dropout(
                modality_rng, batch["encoder_mask"]
            )

            def loss_fn(params):
                out = state.apply_fn(
                    {"params": params},
                    batch["encoder_inputs"], encoder_mask,
                    batch["decoder_ids"], batch["decoder_mask"],
                    batch["labels"], batch.get("align_target"),
                    deterministic=False, rngs={"dropout": drop_rng},
                )
                return out["loss"], out

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, out), grads = grad_fn(state.params)
            # A hand-fused single-pass clip+adamw update was A/B'd on the
            # chip and compiled to the same program as this optax chain:
            # XLA already fuses the whole per-leaf update and interleaves
            # it into the backward pass (in-situ cost 2.3 ms, below the
            # 2.9 ms standalone traffic floor) — see PROFILE.md round 4.
            new_state = state.apply_gradients(grads=grads)
            metrics = {
                "loss": loss,
                "model_only_loss": out["model_only_loss"],
                "alignment_loss": out["alignment_loss"],
            }
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,))

    def _multiproc_shardings(self, template):
        """Under multi-process execution, pin row-leading outputs to
        P('data') so each process can read back exactly the rows it fed
        (parallel.multihost.local_rows); scalars stay replicated. Returns
        None (let GSPMD choose) in the single-process case."""
        if jax.process_count() == 1:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.tree_util.tree_map(
            lambda rows: NamedSharding(self.mesh, P("data") if rows else P()),
            template,
        )

    def _build_eval_step(self):
        def eval_step(params, batch):
            out = self.model.apply(
                {"params": params},
                batch["encoder_inputs"], batch["encoder_mask"],
                batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
                batch.get("align_target"), deterministic=True,
            )
            predicted = jnp.argmax(out["logits"], axis=-1)
            return {"loss": out["loss"],
                    "model_only_loss": out["model_only_loss"],
                    "alignment_loss": out["alignment_loss"],
                    "predicted_ids": predicted}

        shardings = self._multiproc_shardings(
            {"loss": False, "model_only_loss": False,
             "alignment_loss": False, "predicted_ids": True}
        )
        if shardings is not None:
            return jax.jit(eval_step, out_shardings=shardings)
        return jax.jit(eval_step)

    def decode_fn(self, num_beams: int, max_length: Optional[int] = None):
        max_length = max_length or self.model.config.max_target_length
        key = (num_beams, max_length)
        if key not in self._decode_fns:
            def decode(params, encoder_inputs, encoder_mask):
                return beam_search(
                    self.model, {"params": params}, encoder_inputs,
                    encoder_mask, num_beams=num_beams, max_length=max_length,
                )
            shardings = self._multiproc_shardings((True, True))
            if shardings is not None:
                self._decode_fns[key] = jax.jit(decode, out_shardings=shardings)
            else:
                self._decode_fns[key] = jax.jit(decode)
        return self._decode_fns[key]

    # ------------------------------------------------------------- fit
    def fit(
        self,
        state: TrainState,
        train_loader: DataLoader,
        val_loader: Optional[DataLoader],
        epochs: int,
        checkpoints: Optional[CheckpointManager] = None,
        early_stopping_patience: Optional[int] = None,
        limit_val_batches: float = 1.0,
        val_check_interval: Optional[int] = None,
        log_every: int = 10,
        metrics_writer=None,
        resume: bool = False,
        profile_dir: Optional[str] = None,
        max_steps: Optional[int] = None,
    ) -> TrainState:
        """Epoch loop with per-epoch (or per-``val_check_interval`` steps)
        validation, checkpointing, early stopping, optional resume from the
        ``last`` checkpoint (full optimizer state) and optional
        ``jax.profiler`` traces of the first steps.

        ``max_steps`` bounds the GLOBAL optimizer-step count. This is a
        deliberate EXTENSION beyond reference parity (recorded in
        docs/index.md): the reference's Lightning build passes only
        max_epochs and never exposes max_steps; the semantics here follow
        Lightning ``Trainer(max_steps=...)`` so the knob is unsurprising.
        Combined with
        ``resume`` this gives schedule-correct continuation of an interrupted
        run: relaunch with the ORIGINAL data budget (so the OneCycle horizon
        matches the restored optimizer count) and ``max_steps`` at the
        original total so the continuation stops where the first run would
        have. A final validation runs at the bound so ``best`` reflects the
        terminal state even when the bound is not a ``val_check_interval``
        multiple."""
        eval_step = self._build_eval_step()
        best_monitor = -float("inf")
        patience_left = early_stopping_patience
        global_step = 0
        start_epoch = 0

        if resume and checkpoints is not None:
            try:
                restored = checkpoints.restore(
                    "last",
                    {"params": state.params, "opt_state": state.opt_state,
                     "step": 0},
                )
                state = state.replace(
                    params=jax.device_put(
                        restored["params"], replicated(self.mesh)),
                    opt_state=jax.device_put(
                        restored["opt_state"], replicated(self.mesh)),
                    step=restored["step"],
                )
                global_step = int(restored["step"])
                start_epoch = global_step // max(len(train_loader), 1)
                # Deterministic continuation: the shuffling loader seeds
                # each epoch's permutation from (config seed + its epoch
                # COUNTER), which restarts at 0 in a fresh process. Advance
                # it by the epochs already trained so the resumed run sees
                # the same batch order the uninterrupted run would have.
                # RELATIVE, not absolute: pre-fit consumers (init_state's
                # sample batch) bump the counter identically in both the
                # original and the resumed process, so only the skipped
                # epochs need accounting (pinned by tests/test_supervisor.py
                # resume-equality).
                if hasattr(train_loader, "_epoch"):
                    train_loader._epoch += start_epoch
                self._flush_transfers((state.params, state.opt_state))
                logger.info("Resumed from step %d (epoch %d)", global_step,
                            start_epoch)
            except FileNotFoundError:
                logger.info("No checkpoint to resume from; starting fresh")

        stop = max_steps is not None and global_step >= max_steps
        if stop:
            logger.info("Resumed at or past max_steps=%d; nothing to train",
                        max_steps)
        for epoch in range(start_epoch, epochs):
            if stop:
                break
            epoch_start = time.time()
            n_samples = 0
            for batch in train_loader:
                device_batch = _retry_resource_exhausted(
                    lambda: shard_batch(
                        _device_batch(batch, self.model.config.compute_dtype),
                        self.mesh,
                    ),
                    "train-batch device_put",
                )
                if self._train_step is None:
                    probe = device_batch
                    if "encoder_inputs" not in probe:
                        # Device-mixture index batch: trace the expansion
                        # to learn the modality layout (shapes only).
                        probe = jax.eval_shape(
                            self._maybe_expand, probe,
                            self._transform_consts,
                        )
                    segments = _modality_segments(
                        probe["encoder_inputs"],
                        order=list(self.model.data_config),
                    )
                    self._train_step = self._build_train_step(segments)
                if profile_dir and global_step == 2:
                    jax.profiler.start_trace(profile_dir)
                state, metrics = self._train_step(
                    state, device_batch, self._transform_consts)
                if profile_dir and global_step == 6:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), metrics
                    )
                    jax.profiler.stop_trace()
                    logger.info("Profiler trace written to %s", profile_dir)
                n_samples += batch["n_valid"]
                if global_step % log_every == 0:
                    # float(metrics) here would stall the dispatch pipeline
                    # for a device round-trip (~40 ms on the axon relay —
                    # the device sits idle while the host waits); a daemon
                    # thread fetches and logs instead. Holding the metric
                    # handles is safe: they are step outputs, never donated.
                    self._log_async(metrics_writer, epoch, global_step,
                                    metrics)
                global_step += 1

                validated_here = (
                    val_check_interval
                    and val_loader is not None
                    and global_step % val_check_interval == 0
                )
                if validated_here:
                    self._drain_logs()
                    stop, best_monitor, patience_left = self._run_validation(
                        state, val_loader, eval_step, limit_val_batches,
                        checkpoints, metrics_writer, epoch, global_step,
                        early_stopping_patience, best_monitor, patience_left,
                    )
                    if stop:
                        break

                if max_steps is not None and global_step >= max_steps:
                    if val_loader is not None and not validated_here:
                        self._drain_logs()
                        _, best_monitor, patience_left = self._run_validation(
                            state, val_loader, eval_step, limit_val_batches,
                            checkpoints, metrics_writer, epoch, global_step,
                            early_stopping_patience, best_monitor,
                            patience_left, force_save=True,
                        )
                    if (checkpoints is not None and is_main()
                            and self._saved_state_step != global_step):
                        # Terminal state must be resumable at the bound
                        # (ADVICE r4): with no val loader, or when the
                        # interval validation above did not persist `last`
                        # at this step, save the current state now —
                        # otherwise a resume restores an older step and
                        # silently retrains the lost steps.
                        checkpoints.save_async(
                            global_step,
                            {"params": state.params,
                             "opt_state": state.opt_state,
                             "step": global_step},
                            {},
                        )
                        self._saved_state_step = global_step
                    logger.info("Reached max_steps=%d; stopping", max_steps)
                    stop = True
                    break

            elapsed = time.time() - epoch_start
            logger.info(
                "epoch %d done: %d samples in %.1fs (%.1f samples/s)",
                epoch, n_samples, elapsed, n_samples / max(elapsed, 1e-9),
            )
            if stop:
                break

            if val_loader is not None:
                self._drain_logs()
                stop, best_monitor, patience_left = self._run_validation(
                    state, val_loader, eval_step, limit_val_batches,
                    checkpoints, metrics_writer, epoch, global_step,
                    early_stopping_patience, best_monitor, patience_left,
                )
                if stop:
                    break
            elif checkpoints is not None and is_main():
                checkpoints.save_async(
                    global_step,
                    {"params": state.params, "opt_state": state.opt_state,
                     "step": global_step},
                    {},
                )
                self._saved_state_step = global_step

        self._drain_logs()
        if checkpoints is not None:
            self._flush_pending_best(checkpoints)
        return state

    def _log_async(self, writer, epoch: int, step: int, metrics) -> None:
        """Fetch+log train metrics on a daemon thread.

        ``float(metrics)`` on the main thread stalls dispatch for a device
        round-trip per log event (~40 ms on the axon relay) — the device
        idles while the host waits. The handles are step OUTPUTS (never
        donated), so a background fetch is race-free; the checkpoint saver
        uses the same pattern for its D2H."""
        import queue
        import threading

        if self._log_dead:
            return
        if self._log_queue is None:
            # Bounded: if the drain thread ever falls behind (host CPU
            # contention), puts block briefly instead of accumulating
            # device-scalar handles without limit.
            self._log_queue = queue.Queue(maxsize=256)

            def drain():
                while True:
                    writer_, epoch_, step_, m = self._log_queue.get()
                    try:
                        loss = float(m["loss"])
                        logger.info(
                            "epoch %d step %d train_loss %.4f "
                            "(ce %.4f align %.4f)",
                            epoch_, step_, loss,
                            float(m["model_only_loss"]),
                            float(m["alignment_loss"]),
                        )
                        if writer_ is not None:
                            writer_.add_scalar("train_loss", loss, step_)
                            writer_.add_scalar(
                                "train_model_only_loss",
                                float(m["model_only_loss"]), step_,
                            )
                    except Exception:  # noqa: BLE001 - logging must not kill fit
                        logger.exception("async metric logging failed")
                    finally:
                        self._log_queue.task_done()

            threading.Thread(target=drain, daemon=True,
                             name="train-metrics-log").start()
        try:
            # Non-blocking: with a wedged fetch thread the queue fills long
            # before the next bounded drain runs (750 log events per 7.5k-
            # step validation interval vs 256 slots) — a blocking put here
            # would reintroduce the hang the drain timeout exists to stop.
            self._log_queue.put_nowait((writer, epoch, step, metrics))
        except queue.Full:
            self._log_dead = True
            logger.warning(
                "async metric log queue full (fetch thread wedged?) — "
                "disabling train-metric logging for this fit"
            )

    def _drain_logs(self, timeout_s: float = 180.0) -> None:
        """Bounded drain: a queue.join() here hung fit for the full stage
        timeout when the fetch thread wedged on the relay (round 5, ft
        folds). Poll with a deadline instead; on timeout, abandon async
        metric logging for the rest of the fit — training and validation
        matter more than train-loss log lines."""
        if self._log_queue is None or self._log_dead:
            return
        deadline = time.time() + timeout_s
        while self._log_queue.unfinished_tasks and time.time() < deadline:
            time.sleep(0.05)
        if self._log_queue.unfinished_tasks:
            self._log_dead = True
            logger.warning(
                "async metric log drain timed out after %.0fs with %d "
                "pending fetches — the log thread is likely wedged on the "
                "relay; disabling train-metric logging for this fit",
                timeout_s, self._log_queue.unfinished_tasks,
            )

    def _flush_pending_best(self, checkpoints) -> None:
        """End-of-fit: drain in-flight saves FIRST (save_async's queue is
        latest-wins, so flushing while one is queued could drop it), then
        flush any rate-suppressed best state so fit never ends without it.

        Both drains are bounded by ``checkpoint_wait_timeout_s``: a relay
        wedge mid-D2H must not hang a finished run (VERDICT r2 item 6). On
        timeout the in-flight save is abandoned (CheckpointManager logs the
        surviving on-disk state) and any rate-suppressed best is dropped
        with an explicit log, since the wedged saver thread could never
        write it anyway."""
        timeout = self.checkpoint_wait_timeout_s
        drained = checkpoints.wait(timeout_s=timeout)
        if self._pending_best is not None and is_main():
            b_step, b_tree, b_metrics = self._pending_best
            self._pending_best = None
            if not drained:
                logger.error(
                    "Dropping rate-suppressed best (step %d, %s=%s): the "
                    "checkpoint saver is wedged and cannot take new work.",
                    b_step, self.monitor, b_metrics.get(self.monitor),
                )
                return
            checkpoints.save_async(b_step, b_tree, b_metrics)
            checkpoints.wait(timeout_s=timeout)

    def _run_validation(
        self, state, val_loader, eval_step, limit_val_batches, checkpoints,
        metrics_writer, epoch, global_step, early_stopping_patience,
        best_monitor, patience_left, force_save=False,
    ):
        """``force_save=True`` (terminal validation at the ``max_steps``
        bound): persist the CURRENT state even when the cadence says the
        save is not due, so ``last`` always lands at the bound and a resume
        is a no-op (ADVICE r4). A pinned rate-suppressed best is left for
        the end-of-fit flush rather than consumed here — the forced save
        must write the terminal state, not an older snapshot."""
        val_metrics = self.validate(state, val_loader, eval_step, limit_val_batches)
        logger.info(
            "epoch %d val_loss %.4f val_token_acc %.4f "
            "val_molecular_accuracy %.4f",
            epoch, val_metrics["val_loss"], val_metrics["val_token_acc"],
            val_metrics["val_molecular_accuracy"],
        )
        if metrics_writer is not None:
            for key, value in val_metrics.items():
                metrics_writer.add_scalar(key, value, global_step)

        stop = False
        monitor = val_metrics.get(self.monitor, 0.0)
        if self.monitor_mode == "min":
            monitor = -monitor

        self._val_count += 1
        # ``best_monitor`` tracks the running best unconditionally (not only
        # under early stopping) so "improved" means what it says — without
        # this, every validation counted as an improvement when
        # early_stopping_patience was None.
        improved = monitor > best_monitor
        if improved:
            best_monitor = monitor
        # Improvement-saves are RATE-LIMITED to the cadence rather than
        # fired every time: on a steadily improving run nearly every
        # validation improves, and each save ships ~0.6 GB of params +
        # optimizer state device->host (~45 s on the axon tunnel, dwarfing
        # 1-2 s epochs). Saves are asynchronous (device-side snapshot, D2H +
        # disk write on a background thread), so the rate limit is policy
        # (bound tunnel traffic), not protection.
        #
        # A rate-SUPPRESSED improvement is never lost (ADVICE r1): the
        # improved state is pinned on device (checkpoints.snapshot — cheap
        # HBM copy, no tunnel traffic) and flushed by the next due save that
        # is not itself an improvement, or at end of fit. A due save with a
        # pinned best writes the pinned state INSTEAD of the current one —
        # one save per event keeps tunnel traffic at the configured cadence
        # (and save_async's latest-wins queue can never drop the best);
        # the next due save restores resume freshness.
        due = self._val_count % self.checkpoint_every_n_vals == 0
        improvement_save = (
            improved
            and self._val_count - self._last_improvement_save
            >= self.checkpoint_every_n_vals
        )
        if checkpoints is not None and is_main():
            if due or improvement_save or force_save:
                if improvement_save:
                    self._last_improvement_save = self._val_count
                if improved:
                    # Current state is the best ever seen; any pinned
                    # older best is superseded.
                    self._pending_best = None
                if self._pending_best is not None and not force_save:
                    b_step, b_tree, b_metrics = self._pending_best
                    self._pending_best = None
                    checkpoints.save_async(b_step, b_tree, b_metrics)
                    self._saved_state_step = b_step
                else:
                    checkpoints.save_async(
                        global_step,
                        {"params": state.params,
                         "opt_state": state.opt_state,
                         "step": global_step},
                        val_metrics,
                    )
                    self._saved_state_step = global_step
            elif improved:
                self._pending_best = (
                    global_step,
                    checkpoints.snapshot(
                        {"params": state.params,
                         "opt_state": state.opt_state,
                         "step": global_step}
                    ),
                    dict(val_metrics),
                )
        if early_stopping_patience is not None:
            if improved:
                patience_left = early_stopping_patience
            else:
                patience_left -= 1
                if patience_left <= 0:
                    logger.info("Early stopping at epoch %d", epoch)
                    stop = True
        return stop, best_monitor, patience_left

    # -------------------------------------------------------- validation
    def validate(
        self, state: TrainState, val_loader: DataLoader, eval_step,
        limit_val_batches: float = 1.0,
    ) -> Dict[str, float]:
        """Weighted validation metrics (reference wrapper.py:491-525).

        Token/molecular accuracies accumulate exact (correct, total) counts
        — a decomposition that is identical whether rows live on one process
        or are spread over many. Under multi-process execution each process
        scores only the rows it fed (``local_rows``) and the counts are
        summed across processes at the end, so every process computes the
        same metrics and takes the same checkpoint/early-stop decisions.
        """
        losses: List[float] = []
        # per-batch local rows: [n_valid, tok_correct, tok_total, mol_correct]
        stats: List[List[float]] = []
        max_batches = len(val_loader)
        if limit_val_batches < 1.0:
            max_batches = max(1, int(max_batches * limit_val_batches))
        decode = self.decode_fn(num_beams=1)

        # Pipelined dispatch/fetch at bounded depth: dispatch runs ahead of
        # fetch+score by PIPELINE_DEPTH batches (device execution is
        # in-order and asynchronous), so the fetch/score of batch i overlaps
        # the compute of batches i+1..i+k. Fetching inside the dispatch loop
        # serialized a device round-trip per batch (~2 x 40 ms on the axon
        # relay); dispatch-ALL-then-fetch (rounds 2-3) kept the relay just
        # as busy but pinned every batch's seqs+logits handles for the whole
        # pass — unbounded device memory on an uncapped loader (VERDICT r3
        # item 7). Depth k bounds pinned output to k batches.
        pending: deque = deque()

        def _score(item) -> None:
            batch, out, seqs = item
            n_valid = batch["n_valid"]
            # Global (cross-process) mean loss — identical on all processes.
            losses.append(float(out["loss"]))
            labels = np.asarray(batch["labels"])[:n_valid]
            predicted = local_rows(out["predicted_ids"])[:n_valid]
            mask = labels != -100
            tok_total = int(mask.sum())
            tok_correct = int(((labels == predicted) & mask).sum())
            decoded = self.tokenizer.batch_decode(
                local_rows(seqs)[:n_valid, 0, :], skip_special_tokens=True
            )
            scores = calc_sampling_metrics(
                [[d] for d in decoded],
                batch["target_strings"][:n_valid],
                molecules=False,
            )
            mol_correct = int(round(scores.get("Top-1", 0.0) * n_valid))
            stats.append([n_valid, tok_correct, tok_total, mol_correct])

        for i, batch in enumerate(val_loader):
            if i >= max_batches:
                break
            device_batch = _retry_resource_exhausted(
                lambda: shard_batch(
                    _device_batch(batch, self.model.config.compute_dtype),
                    self.mesh,
                ),
                "val-batch device_put",
            )
            out = eval_step(state.params, device_batch)
            seqs, _ = decode(
                state.params, device_batch["encoder_inputs"],
                device_batch["encoder_mask"],
            )
            pending.append((batch, out, seqs))
            if len(pending) > PIPELINE_DEPTH:
                _score(pending.popleft())
        while pending:
            _score(pending.popleft())

        if not stats:
            return {"val_loss": 0.0, "val_token_acc": 0.0,
                    "val_molecular_accuracy": 0.0}
        totals = sum_across_processes(np.asarray(stats, dtype=np.float64))
        weights = totals[:, 0]
        n_rows = weights.sum()
        val_loss = (
            float(np.average(losses, weights=weights)) if n_rows else 0.0
        )
        return {
            "val_loss": val_loss,
            "val_token_acc": float(
                totals[:, 1].sum() / max(totals[:, 2].sum(), 1.0)),
            "val_molecular_accuracy": float(
                totals[:, 3].sum() / max(n_rows, 1.0)),
        }

    # ----------------------------------------------------------- predict
    def predict(
        self,
        state: TrainState,
        loader: DataLoader,
        n_beams: Optional[int] = None,
        guided=None,
    ) -> Dict[str, Any]:
        """Beam-search predictions over a loader.

        ``guided``: optional ``generation.guided.GuidedDecoder`` enabling
        formula-constrained decoding. Returns {"predictions": [[beam strings]
        per sample], "targets": [...], "avg_loss": float, extra columns...}.
        """
        n_beams = n_beams or self.n_beams
        eval_step = self._build_eval_step()
        cfg = self.model.config
        predictions: List[List[str]] = []
        targets: List[str] = []
        losses: List[float] = []
        extras: Dict[str, List[Any]] = {}

        # Bounded-depth pipeline, like validate: the fetch/decode of batch i
        # overlaps the device compute of batches i+1..i+k while pinning at
        # most PIPELINE_DEPTH batches' outputs (an uncapped predict over a
        # large parquet no longer holds every batch's seqs+logits handles).
        pending: deque = deque()

        def _fetch(item) -> None:
            batch, out, seqs = item
            losses.append(float(out["loss"]))
            n_valid = batch["n_valid"]
            # Local (this process's) rows only; multi-process runs write
            # per-rank artifacts like the reference's DDP predict
            # (reference cli/training.py:230-251).
            seqs = local_rows(seqs)[:n_valid]  # (B, K, L)
            flat = seqs.reshape(-1, seqs.shape[-1])
            decoded = self.tokenizer.batch_decode(flat, skip_special_tokens=True)
            for i in range(seqs.shape[0]):
                predictions.append(decoded[i * n_beams : (i + 1) * n_beams])
            targets.extend(batch["target_strings"][:n_valid])
            for col, values in batch.items():
                if col not in (
                    "encoder_inputs", "encoder_mask", "decoder_ids",
                    "decoder_mask", "labels", "target_strings", "align_target",
                    "vector_target", "n_valid",
                ):
                    extras.setdefault(col, []).extend(list(values)[:n_valid])

        for batch in loader:
            device_batch = _retry_resource_exhausted(
                lambda: shard_batch(
                    _device_batch(batch, self.model.config.compute_dtype),
                    self.mesh,
                ),
                "predict-batch device_put",
            )
            out = eval_step(state.params, device_batch)

            if guided is not None:
                # One compile for the whole run: the hook is a static
                # closure; per-batch target counts ride in the (traced)
                # hook state (guided.py GuidedDecoder).
                key = ("guided", n_beams, cfg.max_target_length)
                if key not in self._decode_fns:
                    def decode_guided(params, enc, mask, hook_state):
                        return beam_search(
                            self.model, {"params": params}, enc, mask,
                            num_beams=n_beams,
                            max_length=cfg.max_target_length,
                            logits_hook=guided.hook, hook_init=hook_state,
                        )
                    shardings = self._multiproc_shardings((True, True))
                    if shardings is not None:
                        self._decode_fns[key] = jax.jit(
                            decode_guided, out_shardings=shardings)
                    else:
                        self._decode_fns[key] = jax.jit(decode_guided)
                seqs, _ = self._decode_fns[key](
                    state.params, device_batch["encoder_inputs"],
                    device_batch["encoder_mask"],
                    shard_batch(guided.state_for(batch, n_beams), self.mesh),
                )
            else:
                decode = self.decode_fn(num_beams=n_beams)
                seqs, _ = decode(
                    state.params, device_batch["encoder_inputs"],
                    device_batch["encoder_mask"],
                )
            pending.append((batch, out, seqs))
            if len(pending) > PIPELINE_DEPTH:
                _fetch(pending.popleft())
        while pending:
            _fetch(pending.popleft())

        return {
            "avg_loss": float(np.mean(losses)) if losses else 0.0,
            "predictions": predictions,
            "targets": targets,
            **extras,
        }
