"""Batch inference server: spectra in, ranked SMILES out, over HTTP.

The reference framework stops at an offline predict CLI (reference
cli/predict.py); production use of these models is interactive — an
analyst submits one or a few spectra and wants ranked structures back.
This server wraps the jitted beam-search decode path behind a minimal
HTTP JSON API with DYNAMIC BATCHING: requests arriving within a short
window are collated into ONE static-shape batch (padded to the model's
``batch_size``, so the graph compiled at warmup is the only graph that
ever runs) and decoded together; each caller gets back its own rows.

The preprocessor artifact is self-sufficient: it carries the fitted
preprocessor state AND the collator's static max lengths
(data_utils.save_collator_lengths), so no dataset is needed at serve
time.

API
---
``GET /healthz``  -> {"status": "ok", "model": ..., "batch_size": N}
``POST /predict`` -> body {"records": [{<column>: <value>, ...}, ...]}
                     response {"results": [{"smiles": [...], "scores":
                     [...]} per record]}
Record columns are the same raw columns the training parquet uses (e.g.
``IR`` -> list of floats, ``Formula`` -> string). The target column may
be omitted.

Usage::

    python -m multimodalanalytical_tpu.cli.serve \
        preprocessor_path=runs/ir/preprocessor.json \
        model=custom_model model.model_checkpoint_path=runs/ir/checkpoints/best \
        serve.port=8000 serve.max_wait_ms=20
"""

from __future__ import annotations

import json
import logging
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..config import compose_config
from ..data.collator import MultiModalCollator
from ..data.data_utils import (
    load_collator_lengths,
    load_preprocessors_artifact,
)
from ..generation.beam_search import beam_search
from ..training.checkpoint import restore_params
from ..training.trainer import _device_batch
from ..utils import enable_compilation_cache, seed_everything, setup_logging
from .common import build_model, default_configs_dir

logger = logging.getLogger(__name__)


class _Pending:
    """One request's slot: raw record in, decoded beams (or error) out."""

    __slots__ = ("record", "event", "result", "error")

    def __init__(self, record: Dict[str, Any]):
        self.record = record
        self.event = threading.Event()
        self.result: Optional[Dict[str, Any]] = None
        self.error: Optional[str] = None


class InferenceEngine:
    """Owns the model, the jitted decode, and the batching loop."""

    def __init__(self, config: Dict[str, Any]):
        model_config: Dict[str, Any] = dict(config["model"])
        if not model_config.get("model_checkpoint_path"):
            raise ValueError(
                "Please supply model_checkpoint_path with "
                "model.model_checkpoint_path=..."
            )
        artifact = config.get("preprocessor_path")
        if not artifact:
            raise ValueError("Please supply preprocessor_path=...")

        data_config, preprocessors = load_preprocessors_artifact(Path(artifact))
        lengths = load_collator_lengths(Path(artifact))
        if lengths is None:
            raise ValueError(
                f"{artifact} predates serving support (no collator_lengths); "
                "re-run training once to refresh it, or pass the shapes via "
                "a fresh artifact."
            )

        self.batch_size = int(
            config.get("serve", {}).get("batch_size")
            or model_config["batch_size"]
        )
        self.collator = MultiModalCollator(
            preprocessors=preprocessors,
            data_config=data_config,
            max_source_length=lengths["max_source_length"],
            max_target_length=lengths["max_target_length"],
            pad_to_batch_size=self.batch_size,
        )
        self.target_modality = self.collator.target_modality
        self.tokenizer = preprocessors[self.target_modality]
        self.input_columns = self._input_columns(data_config)

        self.model, self.cfg = build_model(
            model_config, data_config, self.target_modality, self.tokenizer
        )
        self.n_beams = int(model_config.get("n_beams", 10))

        # Params: init for the template pytree, then restore the checkpoint.
        warm = _device_batch(self._warm_batch(), self.cfg.compute_dtype)
        variables = self.model.init(
            jax.random.PRNGKey(0),
            warm["encoder_inputs"], warm["encoder_mask"],
            warm["decoder_ids"], warm["decoder_mask"], warm["labels"],
            deterministic=True,
        )
        self.params = restore_params(
            model_config["model_checkpoint_path"], variables["params"]
        )
        logger.info("Restored checkpoint from %s",
                    model_config["model_checkpoint_path"])

        def decode(params, enc, mask):
            return beam_search(
                self.model, {"params": params}, enc, mask,
                num_beams=self.n_beams,
                max_length=self.cfg.max_target_length,
            )

        self._decode = jax.jit(decode)
        logger.info("Warming up the decode graph (one-off compile)...")
        seqs, _ = self._decode(
            self.params, warm["encoder_inputs"], warm["encoder_mask"]
        )
        np.asarray(seqs[0, 0, 0])
        logger.info("Warmup done; serving batch_size=%d n_beams=%d",
                    self.batch_size, self.n_beams)

        serve_cfg = config.get("serve") or {}
        self.max_wait_s = float(serve_cfg.get("max_wait_ms", 20)) / 1e3
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._worker = threading.Thread(target=self._batch_loop, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- intake
    @staticmethod
    def _input_columns(data_config: Dict[str, Any]) -> List[str]:
        return [m for m, c in data_config.items() if not c["target"]]

    def _warm_batch(self) -> Dict[str, Any]:
        """A dummy batch producing the SAME static shapes real requests do.

        Patches get zero spectra at the fit-time length (n_patches x
        patch_size — the patch count is input-length-derived, so serve
        requests must ship spectra at the training length); text gets a
        minimal token; every other modality rides the None -> fully-masked
        segment path (same shapes as real rows, RESULTS.md subset-serving).
        """
        record: Dict[str, Any] = {}
        for modality in self.input_columns:
            mtype = self.collator.data_config[modality]["type"]
            if mtype == "text":
                record[modality] = "C"
            elif mtype == "1D_patches":
                prep = self.collator.preprocessors[modality]
                n_patches = self.collator.max_source_length[modality]
                record[modality] = [0.0] * (n_patches * prep.patch_size)
            else:
                record[modality] = None
        record[self.target_modality] = ""
        return self.collator({k: [v] for k, v in record.items()})

    def validate_record(self, record: Dict[str, Any]) -> None:
        """Collate the record alone on the CPU (cheap — no decode) so
        malformed inputs are rejected with 400 at intake instead of failing
        whole-batch collation later: the per-record isolation fallback
        re-runs a FULL padded-batch decode per group member, so a client
        repeatedly posting one bad record alongside real load could keep
        the single worker saturated (advice r1). Raises on bad input."""
        columns = {
            col: [record.get(col, "" if col == self.target_modality else None)]
            for col in self.input_columns + [self.target_modality]
        }
        self.collator(columns)

    def submit(self, record: Dict[str, Any]) -> _Pending:
        pending = _Pending(record)
        self._queue.put(pending)
        return pending

    # ------------------------------------------------------------ batching
    def _batch_loop(self) -> None:
        while True:
            first = self._queue.get()
            group = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(group) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    group.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._run_group(group)
            except Exception:  # noqa: BLE001 - isolated per request below
                # One malformed record (wrong spectrum length, bad type)
                # fails collation for the whole group — retry each record
                # alone so only the culprits see an error.
                logger.exception("Batch failed; isolating per record")
                for pending in group:
                    try:
                        self._run_group([pending])
                    except Exception as exc:  # noqa: BLE001
                        pending.error = str(exc)
                        pending.event.set()

    def _run_group(self, group: List[_Pending]) -> None:
        columns: Dict[str, List[Any]] = {}
        for col in self.input_columns + [self.target_modality]:
            columns[col] = [
                p.record.get(col, "" if col == self.target_modality else None)
                for p in group
            ]
        batch = self.collator(columns)
        # Ship bf16 encoder inputs (bit-identical for bf16-compute models;
        # halves the request's host->device bytes — see trainer._device_batch).
        inputs = _device_batch(batch, self.cfg.compute_dtype)
        seqs, scores = self._decode(
            self.params, inputs["encoder_inputs"], inputs["encoder_mask"]
        )
        seqs = np.asarray(seqs)[: len(group)]
        scores = np.asarray(scores)[: len(group)]
        flat = seqs.reshape(-1, seqs.shape[-1])
        decoded = self.tokenizer.batch_decode(flat, skip_special_tokens=True)
        for i, pending in enumerate(group):
            pending.result = {
                "smiles": decoded[i * self.n_beams : (i + 1) * self.n_beams],
                "scores": [float(s) for s in scores[i]],
            }
            pending.event.set()


def make_handler(engine: InferenceEngine, model_name: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.debug("http: " + fmt, *args)

        def _send(self, code: int, payload: Dict[str, Any]) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 - http.server API
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok", "model": model_name,
                    "batch_size": engine.batch_size,
                    "n_beams": engine.n_beams,
                })
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802 - http.server API
            if self.path != "/predict":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                records = payload["records"]
                if not isinstance(records, list) or not records:
                    raise ValueError("records must be a non-empty list")
                if len(records) > engine.batch_size:
                    raise ValueError(
                        f"at most {engine.batch_size} records per request"
                    )
                # Reject malformed records at intake (CPU-only collation),
                # before they can poison a batch (advice r1).
                for i, record in enumerate(records):
                    try:
                        engine.validate_record(record)
                    except Exception as exc:  # noqa: BLE001 - client error
                        raise ValueError(f"record {i} invalid: {exc}") from exc
            except Exception as exc:  # noqa: BLE001 - client error
                self._send(400, {"error": str(exc)})
                return
            pendings = [engine.submit(r) for r in records]
            results = []
            # Generous timeout relative to one padded-batch decode: if the
            # batching worker ever dies the client gets 503 instead of a
            # connection hung forever (advice r1).
            timeout_s = max(60.0, engine.max_wait_s * 10)
            for pending in pendings:
                if not pending.event.wait(timeout=timeout_s):
                    logger.error("Inference timed out after %.0fs", timeout_s)
                    self._send(503, {"error": "inference timed out"})
                    return
                if pending.error is not None:
                    # Log the detail server-side; clients get a generic
                    # message (raw exception text leaks internal paths).
                    logger.error("Inference failed: %s", pending.error)
                    self._send(500, {"error": "inference failed"})
                    return
                results.append(pending.result)
            self._send(200, {"results": results})

    return Handler


class _Server(ThreadingHTTPServer):
    # The default accept backlog (5) resets connections under bursts of
    # concurrent single-record clients — exactly the dynamic-batching
    # sweet spot. One batch is `batch_size` requests; give bursts room.
    request_queue_size = 512
    daemon_threads = True


def build_server(config: Dict[str, Any]) -> ThreadingHTTPServer:
    """Construct the engine + HTTP server without entering serve_forever
    (tests drive this directly)."""
    serve_cfg = config.get("serve") or {}
    engine = InferenceEngine(config)
    host = serve_cfg.get("host", "127.0.0.1")
    port = int(serve_cfg.get("port", 8000))
    server = _Server(
        (host, port), make_handler(engine, config["model"].get("model_type",
                                                              "CustomModel"))
    )
    server.engine = engine  # for tests
    return server


def run(config: Dict[str, Any]) -> None:
    work_dir = Path(config.get("working_dir", ".")) / config.get(
        "job_name", "serve")
    work_dir.mkdir(parents=True, exist_ok=True)
    setup_logging(work_dir / "serve.log")
    enable_compilation_cache()
    seed_everything()
    from ..tpu_guard import guard_if_tpu

    if guard_if_tpu():
        logger.info("Holding the single-instance TPU lock (axon relay)")
    server = build_server(config)
    host, port = server.server_address[:2]
    logger.info("Serving on http://%s:%s (POST /predict)", host, port)
    server.serve_forever()


def main(argv: List[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    config = compose_config(default_configs_dir(), "config_serve", argv)
    run(config)


if __name__ == "__main__":
    main()
