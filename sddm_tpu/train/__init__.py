from .state import TrainState, make_optimizer, OPTIMIZERS
from .checkpoints import save_rotating_checkpoint, load_checkpoint
from .trainer import Trainer
from .snr_trainer import SNREstimatorTrainer

__all__ = [
    "TrainState",
    "make_optimizer",
    "OPTIMIZERS",
    "save_rotating_checkpoint",
    "load_checkpoint",
    "Trainer",
    "SNREstimatorTrainer",
]
