from . import fid, inference, rb_webface, verification, verify_runner
from .fid import embedding_fid, frechet_distance, gaussian_stats
from .inference import (encoder_bootstrap, extract_features_from_folder,
                        face_grid, run_on_batch, tensor2im)
from .verification import calculate_accuracy, calculate_roc, calculate_val, evaluate
from .verify_runner import (compute_embeddings, get_rfw_val_data,
                            load_val_pair, make_embed_fn, perform_val)

__all__ = ["fid", "embedding_fid", "frechet_distance", "gaussian_stats",
           "inference", "rb_webface", "encoder_bootstrap",
           "extract_features_from_folder", "face_grid", "run_on_batch",
           "tensor2im", "verification", "verify_runner",
           "calculate_accuracy",
           "calculate_roc", "calculate_val", "evaluate",
           "compute_embeddings", "get_rfw_val_data", "load_val_pair",
           "make_embed_fn", "perform_val"]
