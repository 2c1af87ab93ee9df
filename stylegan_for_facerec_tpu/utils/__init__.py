from . import checkpoint, config, export, torch_convert
from .checkpoint import (CheckpointManager, load_checkpoint,
                         load_metadata, save_checkpoint)
from .config import (Stage1Config, Stage2Options, Stage3Options,
                     from_reference_stage3, load_config)
from .export import (export_embedder, export_embedder_sharded,
                     export_generator, export_jittable,
                     load_exported, save_exported)

__all__ = ["checkpoint", "config", "export", "torch_convert",
           "CheckpointManager",
           "load_checkpoint", "load_metadata", "save_checkpoint",
           "Stage1Config", "Stage2Options", "Stage3Options",
           "from_reference_stage3", "load_config",
           "export_embedder", "export_embedder_sharded",
           "export_generator", "export_jittable",
           "load_exported", "save_exported"]
