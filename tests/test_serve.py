"""Serving e2e: train a tiny model, then serve it over HTTP with dynamic
batching (cli/serve.py). No reference counterpart — the reference stops at
the offline predict CLI."""

import json
import sys
import threading
import urllib.request
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


TINY_MODEL = [
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


@pytest.mark.e2e
def test_serve_roundtrip(fixture_dataset, tmp_path):
    from multimodalanalytical_tpu.cli import serve, training
    from multimodalanalytical_tpu.cli.common import default_configs_dir
    from multimodalanalytical_tpu.config import compose_config

    training.main([
        f"working_dir={tmp_path}",
        "job_name=train",
        "data=ir/patches",
        f"data_path={fixture_dataset}",
        "data.IR.preprocessor_arguments.patch_size=125",
        "data.Formula.column=molecular_formula",
        "model=custom_model",
        "trainer.epochs=1",
        "trainer.acc_batches=1",
        *TINY_MODEL,
    ])

    artifact = tmp_path / "train" / "preprocessor.json"
    assert artifact.exists()
    # The artifact now embeds the fitted static batch shapes.
    payload = json.loads(artifact.read_text())
    assert "collator_lengths" in payload

    config = compose_config(default_configs_dir(), "config_serve", [
        f"working_dir={tmp_path}",
        "data=ir/patches",
        "data.IR.preprocessor_arguments.patch_size=125",
        "data.Formula.column=molecular_formula",
        f"preprocessor_path={artifact}",
        "model=custom_model",
        f"model.model_checkpoint_path={tmp_path / 'train' / 'checkpoints' / 'last'}",
        *TINY_MODEL,
        "serve.port=0",
        "serve.max_wait_ms=5",
    ])
    server = serve.build_server(config)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"

        with urllib.request.urlopen(f"{base}/healthz") as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["batch_size"] == 8

        # A real record from the fixture parquet.
        import pyarrow.parquet as pq

        table = pq.read_table(fixture_dataset / "ir_data.parquet")
        row = {c: table.column(c)[0].as_py() for c in table.column_names}
        record = {"IR": row["ir_spectra"], "Formula": row["molecular_formula"]}

        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"records": [record, record]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        results = out["results"]
        assert len(results) == 2
        for res in results:
            assert len(res["smiles"]) == 2          # n_beams
            assert len(res["scores"]) == 2
            assert all(isinstance(s, str) for s in res["smiles"])
        # Both callers sent the same record through one batched decode.
        assert results[0]["smiles"] == results[1]["smiles"]

        # Oversized requests are rejected.
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"records": [record] * 9}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req)

        # A malformed record errors its own request without poisoning the
        # batch: concurrent good requests still succeed.
        bad = {"IR": "not-a-spectrum", "Formula": 42}
        good_out = {}

        def good_client():
            req2 = urllib.request.Request(
                f"{base}/predict",
                data=json.dumps({"records": [record]}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req2) as resp2:
                good_out["results"] = json.loads(resp2.read())["results"]

        good = threading.Thread(target=good_client)
        good.start()
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"records": [bad]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req)
        good.join(timeout=60)
        assert good_out["results"][0]["smiles"] == results[0]["smiles"]
    finally:
        server.shutdown()
