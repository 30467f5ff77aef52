"""Shared CLI pipeline pieces (dataset -> preprocessors -> loaders -> model).

The composition mirrors the reference call stacks (reference
cli/training.py:44-258, cli/predict.py:36-184) on TPU-native building blocks.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Tuple

from ..configuration import DEFAULT_SETTINGS
from ..data.collator import MultiModalCollator
from ..data.data_utils import (
    save_collator_lengths,
    fit_preprocessors,
    load_preprocessors_artifact,
    sample_rows,
    save_preprocessors,
)
from ..data.datasets import IterableDatasetWithLength, TableDataset
from ..models import ModelConfig, Seq2SeqModel, resolve_model_config
from ..training.loader import DataLoader, subsample_dataset

logger = logging.getLogger(__name__)


def default_configs_dir() -> Path:
    return Path(__file__).resolve().parents[2] / "configs"


def sample_train_columns(train_set) -> Dict[str, Any]:
    """<=10k-row sample used for preprocessor/length fitting
    (reference data_utils.py:49-59)."""
    if isinstance(train_set, IterableDatasetWithLength):
        table = train_set.take(min(DEFAULT_SETTINGS.default_samples, len(train_set)))
        return table.columns
    assert isinstance(train_set, TableDataset)
    idx = sample_rows(len(train_set))
    return train_set.slice_columns(idx)


def build_preprocessors(
    config: Dict[str, Any],
    data_config: Dict[str, Any],
    train_set,
) -> Tuple[Dict[str, Any], Dict[str, Any], Path]:
    """Load the preprocessor artifact if present, else fit + save."""
    if config.get("preprocessor_path"):
        artifact_path = Path(config["preprocessor_path"])
    else:
        artifact_path = (
            Path(config["working_dir"]) / config["job_name"] / "preprocessor.json"
        )
    if artifact_path.is_file():
        logger.info("Loading existing preprocessor from: %s", artifact_path)
        data_config, preprocessors = load_preprocessors_artifact(artifact_path)
    else:
        logger.info("No existing preprocessor found at: %s", artifact_path)
        sampled = sample_train_columns(train_set)
        data_config, preprocessors = fit_preprocessors(sampled, data_config)
        save_preprocessors(artifact_path, data_config, preprocessors)
    return data_config, preprocessors, artifact_path


def build_collator(
    data_config: Dict[str, Any],
    preprocessors: Dict[str, Any],
    train_set,
    batch_size: int,
    extra_columns=None,
    artifact_path=None,
) -> MultiModalCollator:
    collator = MultiModalCollator(
        preprocessors=preprocessors,
        data_config=data_config,
        extra_columns=extra_columns,
        pad_to_batch_size=batch_size,
    )
    sampled = sample_train_columns(train_set)
    collator.fit_lengths(sampled)
    if artifact_path is not None and Path(artifact_path).is_file():
        # Persist the fitted static shapes so the artifact alone can serve
        # (cli/serve.py needs the exact jit shapes without a dataset).
        save_collator_lengths(
            artifact_path, collator.max_source_length,
            collator.max_target_length,
        )
    return collator


def build_loaders(
    dataset_dict: Dict[str, Any],
    collator: MultiModalCollator,
    batch_size: int,
    seed: int,
    test_idx=None,
) -> Dict[str, DataLoader]:
    """``test_idx``: optional path to a .npy int index file selecting test
    rows (reference datamodules.py:473-491) — replaces the random 10k cap.

    Under multi-process execution (jax.process_count() > 1) every loader is
    row-sharded: each process feeds its contiguous chunk of every global
    batch (DDP-equivalent; reference trainer/trainer.py:58) and the collator
    pads to the per-process chunk so the assembled global batch keeps the
    configured static batch size.
    """
    import jax

    num_shards = jax.process_count()
    shard_index = jax.process_index()
    if num_shards > 1:
        if batch_size % num_shards != 0:
            raise ValueError(
                f"model.batch_size={batch_size} must be divisible by the "
                f"process count ({num_shards}) for multi-process training"
            )
        collator.pad_to_batch_size = batch_size // num_shards
    shard_kw = dict(num_shards=num_shards, shard_index=shard_index)
    loaders = {}
    if "train" in dataset_dict:
        loaders["train"] = DataLoader(
            dataset_dict["train"], collator, batch_size,
            shuffle=isinstance(dataset_dict["train"], TableDataset), seed=seed,
            **shard_kw,
        )
    if "validation" in dataset_dict:
        loaders["validation"] = DataLoader(
            subsample_dataset(dataset_dict["validation"], 10000, seed),
            collator, batch_size, shuffle=False, **shard_kw,
        )
    if "test" in dataset_dict:
        test_set = dataset_dict["test"]
        if test_idx is not None:
            import numpy as np

            indices = np.load(test_idx)
            test_set = test_set.select(indices)
        else:
            test_set = subsample_dataset(test_set, 10000, seed)
        loaders["test"] = DataLoader(test_set, collator, batch_size,
                                     shuffle=False, **shard_kw)
    return loaders


def build_model(
    model_config_dict: Dict[str, Any],
    data_config: Dict[str, Any],
    target_modality: str,
    tokenizer,
) -> Tuple[Seq2SeqModel, ModelConfig]:
    cfg = resolve_model_config(
        model_config_dict,
        vocab_size=tokenizer.vocab_size,
        pad_token_id=tokenizer.pad_token_id,
        bos_token_id=tokenizer.bos_token_id,
        eos_token_id=tokenizer.eos_token_id,
    )
    model = Seq2SeqModel(
        config=cfg,
        data_config=data_config,
        target_modality=target_modality,
        multimodal_norm=model_config_dict.get("multimodal_norm", True),
    )
    return model, cfg
