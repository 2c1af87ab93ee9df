from . import focal, identity, perceptual
from .focal import (cross_entropy_per_sample, focal_loss,
                    focal_loss_per_sample, softmax_cross_entropy,
                    topk_accuracy)
from .identity import (id_loss, make_irse_id_extractor, make_moco_extractor,
                       similarity_loss, w_norm_loss)
from .perceptual import LPIPS, AlexNetFeatures, lpips_params_from_torch

__all__ = ["focal", "identity", "perceptual", "cross_entropy_per_sample",
           "focal_loss", "focal_loss_per_sample", "softmax_cross_entropy",
           "topk_accuracy", "id_loss", "make_irse_id_extractor",
           "make_moco_extractor", "similarity_loss", "w_norm_loss",
           "LPIPS", "AlexNetFeatures", "lpips_params_from_torch"]
