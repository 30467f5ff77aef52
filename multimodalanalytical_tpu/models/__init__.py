from .config import AlignConfig, ModelConfig, MODEL_PRESETS, resolve_model_config
from .seq2seq import Seq2SeqModel

__all__ = [
    "AlignConfig",
    "ModelConfig",
    "MODEL_PRESETS",
    "Seq2SeqModel",
    "resolve_model_config",
]
