from .loader import DataLoader
from .trainer import Trainer, calculate_training_steps

__all__ = ["DataLoader", "Trainer", "calculate_training_steps"]
