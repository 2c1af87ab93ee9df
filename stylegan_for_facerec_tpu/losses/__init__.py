from . import focal
from .focal import (cross_entropy_per_sample, focal_loss,
                    focal_loss_per_sample, softmax_cross_entropy,
                    topk_accuracy)

__all__ = ["focal", "cross_entropy_per_sample", "focal_loss",
           "focal_loss_per_sample", "softmax_cross_entropy",
           "topk_accuracy"]
