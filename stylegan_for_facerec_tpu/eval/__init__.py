from . import verification, verify_runner
from .verification import calculate_accuracy, calculate_roc, calculate_val, evaluate
from .verify_runner import (compute_embeddings, get_rfw_val_data,
                            load_val_pair, make_embed_fn, perform_val)

__all__ = ["verification", "verify_runner", "calculate_accuracy",
           "calculate_roc", "calculate_val", "evaluate",
           "compute_embeddings", "get_rfw_val_data", "load_val_pair",
           "make_embed_fn", "perform_val"]
