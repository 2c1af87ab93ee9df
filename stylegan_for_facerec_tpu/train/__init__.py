from . import optim, stage1, stage2, stage3
from .stage1 import Stage1Trainer
from .stage2 import Stage2Coach, Stage2Config
from .stage3 import Stage3Config, Stage3Trainer

__all__ = ["optim", "stage1", "stage2", "stage3", "Stage1Trainer",
           "Stage2Coach", "Stage2Config", "Stage3Config", "Stage3Trainer"]
