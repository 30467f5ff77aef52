"""Config composition tests against the real configs/ tree."""

from pathlib import Path

import pytest

from multimodalanalytical_tpu.config import ConfigError, compose_config

CONFIGS = Path(__file__).resolve().parents[1] / "configs"


def test_compose_train_defaults():
    cfg = compose_config(CONFIGS, "config_train", ["working_dir=/tmp/x"])
    assert cfg["data"]["IR"]["type"] == "1D_patches"
    assert cfg["model"]["model_type"] == "CustomModel"
    assert cfg["mixture"] is None
    assert cfg["trainer"]["epochs"] == 60
    assert cfg["trainer"]["log_dir"] == "/tmp/x"  # interpolation


def test_group_and_dotted_overrides():
    cfg = compose_config(CONFIGS, "config_train", [
        "working_dir=/tmp/x",
        "data=multimodal/multimodal",
        "model=custom_model_align",
        "mixture=ir/binary",
        "augment=ir/smooth",
        "data.IR.preprocessor_arguments.patch_size=25",
        "trainer.epochs=3",
        "modality_dropout=[IR,Multiplets,Carbon]",
    ])
    assert "Multiplets" in cfg["data"] and "Carbon" in cfg["data"]
    assert cfg["data"]["IR"]["preprocessor_arguments"]["patch_size"] == 25
    assert cfg["model"]["align_config"]["loss_function"] == "mae"
    assert cfg["mixture"]["balanced"]["n_compounds"] == 2
    assert cfg["augment"]["augmentations"][0]["augment_fns"]["smooth"]["sigmas"] == [0.75, 1.25]
    assert cfg["trainer"]["epochs"] == 3
    assert cfg["modality_dropout"] == ["IR", "Multiplets", "Carbon"]


def test_lr_parses_as_float():
    cfg = compose_config(CONFIGS, "config_train", ["working_dir=/tmp/x"])
    assert isinstance(cfg["model"]["lr"], float)


def test_all_model_presets_compose():
    for preset in ["custom_model", "custom_model_base", "custom_model_large",
                   "custom_model_align", "custom_hf_bart", "hf_bart_medium",
                   "bart_medium", "t5_small"]:
        cfg = compose_config(CONFIGS, "config_train",
                             ["working_dir=/tmp/x", f"model={preset}"])
        assert cfg["model"]["model_type"]


def test_unknown_group_raises():
    with pytest.raises(ConfigError):
        compose_config(CONFIGS, "config_train",
                       ["working_dir=/tmp/x", "data=ir/nope"])


def test_malformed_override_raises():
    with pytest.raises(ConfigError):
        compose_config(CONFIGS, "config_train", ["oops"])


def test_all_data_mixture_augment_groups_compose():
    """Every shipped data/mixture/augment group file composes (the paper
    scripts select these by name; a bad YAML or broken interpolation should
    fail here, not at recipe launch)."""
    from pathlib import Path

    configs = Path(__file__).resolve().parents[1] / "configs"
    for group in ("data", "mixture", "augment"):
        for path in sorted((configs / group).rglob("*.yaml")):
            sel = str(path.relative_to(configs / group)).removesuffix(".yaml")
            cfg = compose_config(
                str(configs), "config_train",
                [f"{group}={sel}", "working_dir=/tmp/x"],
            )
            assert cfg[group if group != "data" else "data"], (group, sel)


def test_unknown_override_raises_plus_adds():
    """Hydra semantics: a plain override of a nonexistent key is an error
    (it is almost always a typo and would otherwise silently change
    nothing); +key=value introduces new keys."""
    with pytest.raises(ConfigError, match="does not exist"):
        compose_config("configs", "config_train",
                       ["model.n_beam=20", "working_dir=/tmp/x"])
    cfg = compose_config("configs", "config_train",
                         ["+model.my_new_knob=7", "working_dir=/tmp/x"])
    assert cfg["model"]["my_new_knob"] == 7
