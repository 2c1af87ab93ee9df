from . import checkpoint, config, torch_convert
from .checkpoint import (CheckpointManager, load_checkpoint,
                         load_metadata, save_checkpoint)
from .config import (Stage1Config, Stage2Options, Stage3Options,
                     from_reference_stage3, load_config)

__all__ = ["checkpoint", "config", "torch_convert", "CheckpointManager",
           "load_checkpoint", "load_metadata", "save_checkpoint",
           "Stage1Config", "Stage2Options", "Stage3Options",
           "from_reference_stage3", "load_config"]
