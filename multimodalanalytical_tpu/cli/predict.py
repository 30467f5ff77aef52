"""Prediction entry point.

TPU-native equivalent of the reference ``predict`` CLI
(reference cli/predict.py:36-184): loads the preprocessor artifact, trims
modalities absent from the current data config (multitask checkpoints serving
singletask requests, reference predict.py:71-77), restores model params,
beam-search decodes and scores, with optional rejection sampling.
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path
from typing import Any, Dict, List

from ..config import compose_config
from ..data.data_utils import load_preprocessors_artifact
from ..data.datasets import build_dataset_multimodal
from ..evaluation.metrics import calc_sampling_metrics, reject_sample
from ..training.checkpoint import restore_params
from ..training.trainer import Trainer
from ..utils import enable_compilation_cache, seed_everything, setup_logging
from .common import (
    build_collator,
    build_loaders,
    build_model,
    default_configs_dir,
)

logger = logging.getLogger(__name__)


def run(config: Dict[str, Any]) -> Dict[str, Any]:
    work_dir = Path(config["working_dir"]) / config["job_name"]
    work_dir.mkdir(parents=True, exist_ok=True)
    setup_logging(work_dir / "predict.log")
    if config.get("model", {}).get("guided_generation") == "exact":
        # Exact-mode guided decoding steps through jax.experimental.io_callback;
        # the axon TPU runtime has no host send/recv callback support
        # (UNIMPLEMENTED, verified 2026-08-17). Exact mode is the
        # parity-verification tool, not the production path (that is
        # `surrogate`, fully in-graph), so run it on the CPU backend.
        import jax

        # Inspect the configured platform list WITHOUT initializing the
        # backend (default_backend() would lock the axon client in).
        if "axon" in (jax.config.jax_platforms or ""):
            logger.warning(
                "guided_generation=exact needs host callbacks, which the "
                "axon TPU runtime does not implement - running this predict "
                "on the CPU backend (use guided_generation=surrogate for "
                "the on-TPU production path)"
            )
            jax.config.update("jax_platforms", "cpu")
            # The launch env may ALSO export JAX_PLATFORMS=axon, and
            # tpu_guard.honor_platform_env re-asserts the env choice over
            # config updates (it exists to beat the sitecustomize) — align
            # the env so the cpu switch survives guard_if_tpu below.
            import os

            os.environ["JAX_PLATFORMS"] = "cpu"
    from ..tpu_guard import guard_if_tpu

    if guard_if_tpu():
        logger.info("Holding the single-instance TPU lock (axon relay)")
    enable_compilation_cache()
    from ..parallel.mesh import initialize_multihost

    if initialize_multihost():
        logger.info("Initialized multi-host JAX (process %s)",
                    __import__("jax").process_index())
    seed = seed_everything()

    model_config: Dict[str, Any] = dict(config["model"])
    if not model_config.get("model_checkpoint_path"):
        raise ValueError(
            "Please supply model_checkpoint_path with "
            "model.model_checkpoint_path=..."
        )

    data_config = dict(config["data"])
    data_config, dataset = build_dataset_multimodal(
        data_config,
        data_path=config["data_path"],
        cv_split=config.get("cv_split", 0),
        splitting=config.get("splitting", "random"),
        augment_config=config.get("augment"),
        num_cpu=config.get("num_cpu", 7),
        mixture_config=config.get("mixture"),
    )

    if not config.get("preprocessor_path"):
        raise ValueError("Please supply preprocessor_path=...")
    loaded_config, preprocessors = load_preprocessors_artifact(
        Path(config["preprocessor_path"])
    )
    # Model keeps the full (possibly multitask) config; the datamodule only
    # the modalities present in the current data config.
    data_config_model = dict(loaded_config)
    data_config_datamodule = {
        k: v for k, v in loaded_config.items() if k in data_config
    }

    batch_size = model_config["batch_size"]
    predict_class = config.get("predict_class")
    collator = build_collator(
        data_config_datamodule, preprocessors, dataset["train"], batch_size,
        extra_columns=[predict_class] if predict_class else None,
    )
    loaders = build_loaders(dataset, collator, batch_size, seed,
                            test_idx=config.get("test_idx"))
    target_modality = collator.target_modality
    tokenizer = preprocessors[target_modality]

    model, cfg = build_model(
        model_config, data_config_datamodule, target_modality, tokenizer
    )

    trainer = Trainer(
        model, tokenizer, num_steps=100, seed=seed,
        n_beams=model_config.get("n_beams", 10),
    )
    sample_batch = next(iter(loaders["test"]))
    state = trainer.init_state(sample_batch)
    params = restore_params(model_config["model_checkpoint_path"], state.params)
    state = trainer.state_with_params(state, params)
    logger.info("Restored checkpoint from %s", model_config["model_checkpoint_path"])

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

    if model_config.get("rejection_sampling"):
        predictions = reject_sample(
            predictions, molecules=config.get("molecules", True)
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

    # Per-rank artifacts under multi-process execution (reference DDP
    # behavior, cli/training.py:230-251).
    from ..parallel.multihost import rank_suffix

    suffix = rank_suffix()
    with (work_dir / f"test_data_logits_beam_{n_beams}{suffix}.json").open("w") as f:
        json.dump(predictions, f)
    metrics_path = work_dir / f"metrics_beam_{n_beams}{suffix}.json"
    with metrics_path.open("w") as f:
        json.dump(metrics, f)
    logger.info("Metrics saved to: %s", metrics_path)
    return metrics


def main(argv: List[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    config = compose_config(default_configs_dir(), "config_predict", argv)
    run(config)


if __name__ == "__main__":
    main()
