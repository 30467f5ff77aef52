"""Training entry point.

TPU-native equivalent of the reference ``train_model`` CLI
(reference cli/training.py:44-258): compose config -> build dataset ->
fit/load preprocessors -> collator/loaders -> model -> fit -> reload best ->
beam-search evaluation -> metrics.

Deliberate non-reproductions: no exception swallowing (reference
cli/training.py:253-254 exits 0 on failure), no barrier dance (single
controller), JSON artifacts instead of pickles.
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path
from typing import Any, Dict, List

from ..config import compose_config
from ..data.datasets import build_dataset_multimodal
from ..evaluation.metrics import calc_sampling_metrics
from ..training.checkpoint import CheckpointManager, load_finetune_params
from ..training.trainer import Trainer, calculate_training_steps
from ..utils import enable_compilation_cache, seed_everything, setup_logging
from .common import (
    build_collator,
    build_loaders,
    build_model,
    build_preprocessors,
    default_configs_dir,
)

logger = logging.getLogger(__name__)


def run(config: Dict[str, Any]) -> Dict[str, Any]:
    work_dir = Path(config["working_dir"]) / config["job_name"]
    work_dir.mkdir(parents=True, exist_ok=True)
    setup_logging(work_dir / "training.log")
    from ..tpu_guard import guard_if_tpu

    if guard_if_tpu():
        logger.info("Holding the single-instance TPU lock (axon relay)")
    enable_compilation_cache()
    from ..parallel.mesh import initialize_multihost

    if initialize_multihost():
        logger.info("Initialized multi-host JAX (process %s)",
                    __import__("jax").process_index())
    seed = seed_everything()

    data_config = dict(config["data"])
    model_config: Dict[str, Any] = dict(config["model"])

    data_config, dataset = build_dataset_multimodal(
        data_config,
        data_path=config["data_path"],
        cv_split=config.get("cv_split", 0),
        splitting=config.get("splitting", "random"),
        augment_config=config.get("augment"),
        num_cpu=config.get("num_cpu", 7),
        mixture_config=config.get("mixture"),
    )
    logger.info("Built dataset")

    data_config, preprocessors, artifact_path = build_preprocessors(
        config, data_config, dataset["train"]
    )
    logger.info("Built preprocessors")

    batch_size = model_config["batch_size"]
    predict_class = config.get("predict_class")
    collator = build_collator(
        data_config, preprocessors, dataset["train"], batch_size,
        extra_columns=[predict_class] if predict_class else None,
        artifact_path=artifact_path,
    )
    loaders = build_loaders(dataset, collator, batch_size, seed)
    target_modality = collator.target_modality
    logger.info("Built loaders (target modality: %s)", target_modality)

    # Device-side mixture synthesis (data/device_mixture.py): for eligible
    # streaming-mixture recipes, stage the pure-compound pool in HBM and
    # stream only sampling decisions — removes the host-bound synthesis/
    # collate/transfer chain (PROFILE.md round 8). ``device_mixing=False``
    # keeps the host generator (the parity reference path).
    batch_transform = None
    if config.get("mixture") and config.get("device_mixing", True):
        from ..data.device_mixture import try_build_device_mixture
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
        device_mix = try_build_device_mixture(
            dataset["train"], data_config, preprocessors, collator,
            batch_size, seed=seed, mesh=mesh,
        )
        if device_mix is not None:
            loaders["train"] = device_mix.loader
            batch_transform = (device_mix.premix, device_mix.consts)
    else:
        mesh = None

    tokenizer = preprocessors[target_modality]
    model, cfg = build_model(model_config, data_config, target_modality, tokenizer)

    epochs = config["trainer"]["epochs"]
    acc_batches = config["trainer"].get("acc_batches", 1) or 1
    train_steps = calculate_training_steps(
        len(dataset["train"]), batch_size, acc_batches, epochs
    )
    trainer = Trainer(
        model, tokenizer,
        mesh=mesh,
        batch_transform=batch_transform,
        optimiser=model_config.get("optimiser", "adam"),
        lr=model_config.get("lr", 1e-3),
        weight_decay=model_config.get("weight_decay", 0.0),
        adam_beta1=model_config.get("adam_beta1", 0.9),
        adam_beta2=model_config.get("adam_beta2", 0.999),
        num_steps=train_steps,
        acc_batches=acc_batches,
        clip_grad=config["trainer"].get("clip_grad", 1.0),
        modality_dropout=config.get("modality_dropout"),
        seed=seed,
        n_beams=model_config.get("n_beams", 10),
        monitor=config["trainer"].get(
            "checkpoint_monitor", "val_molecular_accuracy"),
        checkpoint_every_n_vals=config["trainer"].get(
            "checkpoint_every_n_vals", 1) or 1,
        # Map only an explicit YAML null to the default — 0 is meaningful
        # (abandon an in-flight save immediately at end of fit).
        checkpoint_wait_timeout_s=(
            600.0
            if config["trainer"].get("checkpoint_wait_timeout_s") is None
            else config["trainer"]["checkpoint_wait_timeout_s"]
        ),
    )

    sample_batch = next(iter(loaders["train"]))
    state = trainer.init_state(sample_batch)

    # Finetuning: load params only, stripping align keys when align disabled
    # (reference cli/training.py:152-162).
    if config.get("finetuning") and model_config.get("model_checkpoint_path"):
        params, _ = load_finetune_params(
            model_config["model_checkpoint_path"], state.params,
            strip_align=model_config.get("align_config") is None,
        )
        state = trainer.state_with_params(state, params)
        logger.info("Loaded finetuning checkpoint from %s",
                    model_config["model_checkpoint_path"])

    checkpoints = CheckpointManager(
        work_dir / "checkpoints",
        monitor=config["trainer"].get("checkpoint_monitor", "val_molecular_accuracy"),
        mode="min" if "loss" in config["trainer"].get(
            "checkpoint_monitor", "val_molecular_accuracy") else "max",
    )

    from ..parallel.multihost import is_main, rank_suffix

    metrics_writer = None
    if is_main():
        try:
            import tensorboardX

            metrics_writer = tensorboardX.SummaryWriter(str(work_dir / "tb"))
        except Exception:  # pragma: no cover - tensorboardX optional
            metrics_writer = None

    # Resume (full optimizer state) when a checkpoint path is given without
    # finetuning (reference cli/training.py:165: trainer.fit(ckpt_path=...)).
    resume = bool(model_config.get("model_checkpoint_path")) and not config.get(
        "finetuning"
    )

    state = trainer.fit(
        state,
        loaders["train"],
        loaders.get("validation"),
        epochs=epochs,
        checkpoints=checkpoints,
        early_stopping_patience=config["trainer"].get("early_stopping_patience"),
        limit_val_batches=config["trainer"].get("limit_val_batches", 1.0) or 1.0,
        val_check_interval=config["trainer"].get("val_check_interval"),
        metrics_writer=metrics_writer,
        resume=resume,
        profile_dir=config.get("profile_dir"),
        max_steps=config["trainer"].get("max_steps"),
    )

    # Reload best checkpoint for final evaluation (reference
    # cli/training.py:167-187); fall back to last/current state.
    from ..training.checkpoint import restore_params

    best_dir = work_dir / "checkpoints" / "best"
    if best_dir.exists():
        state = trainer.state_with_params(state, restore_params(best_dir))
        logger.info("Loaded best checkpoint (step %s)", checkpoints.best_step)
    else:
        logger.info("No best checkpoint; evaluating final state")

    n_beams = model_config.get("n_beams", 10)
    guided = None
    guided_mode = model_config.get("guided_generation")
    if guided_mode:
        from ..generation import guided_hook_builder

        # True -> in-graph surrogate; "exact" -> host-callback parity mode.
        mode = guided_mode if isinstance(guided_mode, str) else "surrogate"
        guided = guided_hook_builder(tokenizer, mode=mode)
    predictions = trainer.predict(
        state, loaders["test"], n_beams=n_beams, guided=guided,
    )

    classes = None
    if predict_class and predict_class in predictions:
        classes = predictions[predict_class]
        if classes and isinstance(classes[0], list):
            classes = [c[0] for c in classes]

    metrics = calc_sampling_metrics(
        predictions["predictions"], predictions["targets"],
        classes=classes, molecules=config.get("molecules", True), logging=True,
    )

    # Per-rank artifacts under multi-process execution (reference DDP writes
    # per-rank pickles, cli/training.py:230-251); single-process names are
    # unchanged.
    suffix = rank_suffix()
    predictions_path = work_dir / f"test_data_logits_beam_{n_beams}{suffix}.json"
    with predictions_path.open("w") as f:
        json.dump(
            {k: v for k, v in predictions.items() if k != "avg_loss"} |
            {"avg_loss": predictions["avg_loss"]},
            f,
        )
    metrics_path = work_dir / f"metrics_beam_{n_beams}{suffix}.json"
    with metrics_path.open("w") as f:
        json.dump(metrics, f)
    logger.info("Metrics saved to: %s", metrics_path)
    return metrics


def main(argv: List[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    config = compose_config(default_configs_dir(), "config_train", argv)
    run(config)


if __name__ == "__main__":
    main()
