from . import optim, stage2, stage3
from .stage2 import Stage2Coach, Stage2Config
from .stage3 import Stage3Config, Stage3Trainer

__all__ = ["optim", "stage2", "stage3", "Stage2Coach", "Stage2Config",
           "Stage3Config", "Stage3Trainer"]
