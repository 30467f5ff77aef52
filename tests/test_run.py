"""End-to-end smoke tests: train then predict via the CLIs on a tiny synthetic
parquet fixture (mirrors reference tests/test_run.py, which drives the real
CLIs on a 20-row dataset with 1 epoch)."""

import json
import sys
from pathlib import Path

import pytest

TEST_DATA = Path(__file__).parent / "test_data" / "ir_dataset"


@pytest.fixture(scope="module")
def fixture_dataset():
    if not (TEST_DATA / "ir_data.parquet").exists():
        sys.path.insert(0, str(Path(__file__).parent))
        from make_fixture import main

        main(TEST_DATA)
    return TEST_DATA


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("runs")


@pytest.mark.e2e
def test_training_then_predict(fixture_dataset, run_dir):
    from multimodalanalytical_tpu.cli import predict, training

    overrides = [
        f"working_dir={run_dir}",
        "job_name=train",
        "data=ir/patches",
        f"data_path={fixture_dataset}",
        "data.IR.preprocessor_arguments.patch_size=125",
        "data.Formula.column=molecular_formula",
        "model=custom_model",
        "molecules=True",
        "trainer.epochs=2",
        "trainer.acc_batches=1",
        # small model for CPU CI speed
        "model.d_model=64",
        "model.encoder_layers=1",
        "model.decoder_layers=1",
        "model.encoder_ffn_dim=128",
        "model.decoder_ffn_dim=128",
        "model.encoder_attention_heads=4",
        "model.decoder_attention_heads=4",
        "model.batch_size=8",
        "model.n_beams=2",
        "model.dtype=float32",
    ]
    training.main(overrides)

    metrics_path = run_dir / "train" / "metrics_beam_2.json"
    assert metrics_path.exists()
    metrics = json.loads(metrics_path.read_text())
    assert "Top-1" in metrics and 0.0 <= metrics["Top-1"] <= 1.0
    assert (run_dir / "train" / "preprocessor.json").exists()
    assert (run_dir / "train" / "checkpoints" / "last").exists()

    # Trained params must be finite — a degenerate LR schedule once NaN'd
    # every parameter after the first update on this tiny fixture while the
    # run still "succeeded" (see build_optimizer's transition_steps floor).
    import numpy as np

    from multimodalanalytical_tpu.training.checkpoint import restore_params

    params = restore_params(run_dir / "train" / "checkpoints" / "last")
    import jax

    assert all(
        np.isfinite(np.asarray(leaf)).all()
        for leaf in jax.tree_util.tree_leaves(params)
    ), "non-finite parameters in the trained checkpoint"

    predict_overrides = [
        f"working_dir={run_dir}",
        "job_name=predict",
        "data=ir/patches",
        f"data_path={fixture_dataset}",
        "data.IR.preprocessor_arguments.patch_size=125",
        "data.Formula.column=molecular_formula",
        "model=custom_model",
        "molecules=True",
        f"preprocessor_path={run_dir}/train/preprocessor.json",
        f"model.model_checkpoint_path={run_dir}/train/checkpoints/last",
        "model.d_model=64",
        "model.encoder_layers=1",
        "model.decoder_layers=1",
        "model.encoder_ffn_dim=128",
        "model.decoder_ffn_dim=128",
        "model.encoder_attention_heads=4",
        "model.decoder_attention_heads=4",
        "model.batch_size=8",
        "model.n_beams=2",
        "model.dtype=float32",
    ]
    predict.main(predict_overrides)

    predict_metrics = json.loads(
        (run_dir / "predict" / "metrics_beam_2.json").read_text()
    )
    assert "Top-1" in predict_metrics
