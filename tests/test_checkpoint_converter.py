"""Reference-checkpoint migration: Lightning .ckpt -> orbax, end to end.

Builds a REAL Lightning-style checkpoint file (``state_dict`` under the
``hf_model.`` prefix plus the wrapper's duplicate ``multimodal_embedding.``
entries, reference modeling/wrapper.py:298) from the committed
executed-reference goldens, runs ``scripts/convert_reference_checkpoint.py``
as a user would, restores the result through the SAME
``restore_params`` path the predict/serve CLIs use, and asserts the forward
pass reproduces the reference's fp32 logits — migration is lossless.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_model_parity import (  # noqa: E402
    CASES,
    _build_model,
    _case_arrays,
    build_data_config,
)

GOLDEN = Path(__file__).parent / "golden" / "reference_model_goldens.npz"
SCRIPT = Path(__file__).parent.parent / "scripts" / "convert_reference_checkpoint.py"

CASE = "preln_geglu_alignconv_sincos"   # GEGLU + conv align + sincos


def _fake_lightning_ckpt(sd_np, path):
    state = {f"hf_model.{k}": torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd_np.items()}
    # The wrapper holds a second reference to the embedding module
    # (wrapper.py:298) — its duplicated keys must be ignored on convert.
    for k, v in sd_np.items():
        if k.startswith("embedding."):
            state[f"multimodal_embedding.{k[len('embedding.'):]}"] = (
                torch.from_numpy(np.ascontiguousarray(v)))
    torch.save(
        {"state_dict": state, "epoch": 3, "global_step": 42,
         "pytorch-lightning_version": "2.0.0"},
        path,
    )


def test_lightning_ckpt_roundtrips_to_reference_logits(tmp_path):
    golden = np.load(GOLDEN, allow_pickle=False)
    g, ins, outs = _case_arrays(golden, CASE)

    ckpt = tmp_path / "reference.ckpt"
    out_dir = tmp_path / "converted"
    _fake_lightning_ckpt(g, ckpt)

    r = subprocess.run(
        [sys.executable, str(SCRIPT), str(ckpt), str(out_dir)],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "/root/.axon_site", "HOME": "/root"},
    )
    assert r.returncode == 0, f"converter failed:\n{r.stdout}\n{r.stderr}"
    assert "param arrays" in r.stdout

    from multimodalanalytical_tpu.training.checkpoint import restore_params

    params = restore_params(out_dir)

    case = CASES[CASE]
    data_config = build_data_config(case)
    model = _build_model(case, data_config)
    res = model.apply(
        {"params": params},
        {"Formula": ins["Formula"].astype(np.int32),
         "IR": ins["IR"].astype(np.float32)},
        ins["enc_mask"].astype(np.int32),
        ins["dec_ids"].astype(np.int32),
        ins["dec_mask"].astype(np.int32),
        ins["labels"].astype(np.int32),
        align_target=ins["align_target"].astype(np.float32),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(res["logits"], np.float64), outs["logits"],
        rtol=2e-4, atol=2e-5,
        err_msg="converted checkpoint diverges from the executed reference",
    )


@pytest.mark.parametrize("name,family", [
    ("bart_executed_graph", "BartForConditionalGeneration"),
    ("t5_executed_graph", "T5ForConditionalGeneration"),
])
def test_family_detection_on_hf_state_dicts(name, family):
    """The HF families convert through the same entry point with the wrapper
    prefix stripped and the family auto-detected (no subprocess: the mapping
    itself is already numerically pinned by test_reference_model_parity)."""
    from multimodalanalytical_tpu.models.torch_mapping import (
        detect_model_family,
        lightning_state_dict_to_flax,
    )

    golden = np.load(GOLDEN, allow_pickle=False)
    g, _, _ = _case_arrays(golden, name)
    assert detect_model_family(g) == family
    wrapped = {f"hf_model.{k}": v for k, v in g.items()}
    params = lightning_state_dict_to_flax(wrapped)
    direct = lightning_state_dict_to_flax(g, family=family)
    import jax

    assert jax.tree_util.tree_structure(params) == (
        jax.tree_util.tree_structure(direct))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(direct)):
        np.testing.assert_array_equal(a, b)
