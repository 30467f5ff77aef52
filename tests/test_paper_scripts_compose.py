"""Every paper-replication script's Hydra override set must compose.

The reproduction harness (paper_replication/*/scripts/*.sh) expresses each
paper's recipes as CLI overrides, exactly like the reference's scripts
(e.g. reference paper_replication/ir/scripts/replicate_table_1.sh:22-35).
These scripts cannot run end-to-end without the Zenodo data (zero egress),
so the overrides are the part that silently rots: a renamed config key or
dropped group breaks every recipe at launch time. This test extracts the
override tokens from each `python -m multimodalanalytical_tpu.cli.*`
invocation and asserts `compose_config` accepts them against the real
configs/ tree.
"""

import itertools
import re
import shlex
from pathlib import Path

import pytest

from multimodalanalytical_tpu.config.loader import compose_config

REPO = Path(__file__).resolve().parents[1]
SCRIPTS = sorted((REPO / "paper_replication").glob("*/scripts/*.sh"))

# Shell-variable placeholders for loop/positional variables used in overrides.
_PLACEHOLDERS = {
    "DATA_PATH": "/tmp/data",
    "DATA": "multimodal/ir",
    "WORK_DIR": "/tmp/work",
    "RUN_DIR": "/tmp/run",
    "PRETRAIN_DATA": "/tmp/pre",
    "FINETUNE_DATA": "/tmp/fine",
    "TEST_DATA": "/tmp/test",
    "CKPT": "/tmp/ckpt",
    "PRETRAINED": "/tmp/ckpt",
    "FOLD": "0",
    "POS_ENC": "sin_cos",
    "GATED": "False",
    "PATCH": "125",
    "AUG": "ir/smooth",
    "SIGMA": "2",
    "TASK": "multitask_w_pure",
    "MODALITY": "ir",
    "RADIUS": "1",
    "VARIANT": "num",
    "NETWORK": "conv",
    "LOSS": "mse",
    "LAMBDA": "50",
    "MIX": "ir/binary",
    "N_BEAMS": "10",
    "SPLIT": "random",
    "SEED": "3247",
    "EPOCHS": "1",
}


def _expand(token: str) -> str:
    def sub(match):
        name = match.group(1) or match.group(2)
        return _PLACEHOLDERS.get(name, f"/tmp/{name.lower()}")

    return re.sub(r"\$\{(\w+)[^}]*\}|\$(\w+)", sub, token)


def _extract_invocations(text: str):
    """Yield (module, [override, ...]) per python -m invocation."""
    # Join continuation lines, drop comments.
    text = re.sub(r"\\\s*\n", " ", text)
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("#") or "python" not in line:
            continue
        m = re.search(r"python(?:3)? -m (multimodalanalytical_tpu\.cli\.\w+)(.*)", line)
        if not m:
            continue
        module, rest = m.group(1), m.group(2)
        tokens = [
            _expand(t) for t in shlex.split(rest)
            if "=" in t and not t.startswith("-")
        ]
        yield module, tokens


def _cases():
    for script in SCRIPTS:
        for i, (module, overrides) in enumerate(
            _extract_invocations(script.read_text())
        ):
            rel = script.relative_to(REPO)
            yield pytest.param(module, overrides, id=f"{rel}#{i}")


CASES = list(_cases())


def test_scripts_found():
    assert len(SCRIPTS) >= 14, SCRIPTS
    assert len(CASES) >= 14


@pytest.mark.parametrize("module,overrides", [c.values for c in CASES],
                         ids=[c.id for c in CASES])
def test_script_overrides_compose(module, overrides):
    base = "config_predict" if module.endswith("predict") else "config_train"
    cfg = compose_config(str(REPO / "configs"), base, overrides)
    assert "data" in cfg and "model" in cfg
    # Every dotted override must have landed on an existing path.
    for ov in overrides:
        key = ov.split("=", 1)[0]
        if "." not in key:
            continue
        node = cfg
        for part in key.split("."):
            assert isinstance(node, dict) and part in node, (
                f"{key} did not land in composed config ({part} missing)"
            )
            node = node[part]
