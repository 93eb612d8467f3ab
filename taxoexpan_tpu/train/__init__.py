from .optim import PlateauScheduler, build_optimizer
from .trainer import Trainer

__all__ = ["Trainer", "build_optimizer", "PlateauScheduler"]
