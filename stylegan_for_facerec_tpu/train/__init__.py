from . import optim, stage3
from .stage3 import Stage3Config, Stage3Trainer

__all__ = ["optim", "stage3", "Stage3Config", "Stage3Trainer"]
