"""Stage-2 dataset / transform / path registries.

Parity targets: ``restyle-encoder/configs/data_configs.py:5-55``
(incl. the AfrAsianFaceSet entry), ``transforms_config.py:15-74``
(gt/test/inference resized to 112x112, source kept as-is, all normalized
to [-1,1]), ``paths_config.py:1-39``.

Transforms here are declarative size/normalize specs consumed by
``data.images_dataset.ImagesDataset`` rather than torchvision pipelines.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

# user-editable path registry (paths_config.py equivalent)
DATASET_PATHS: Dict[str, str] = {
    "ffhq": "",
    "celeba_test": "",
    "celeba_test_112p": "",
    "cars_train": "", "cars_test": "",
    "church_train": "", "church_test": "",
    "horse_train": "", "horse_test": "",
    "afhq_wild_train": "", "afhq_wild_test": "",
    "AfrAsianFaceSet": "",
}

MODEL_PATHS: Dict[str, str] = {
    # torch-format pretrained checkpoints loadable via utils.torch_convert
    "ir_se50": "pretrained_models/model_ir_se50.pth",
    "stylegan_ffhq": "pretrained_models/stylegan2-ffhq-config-f.pt",
    "mtcnn_pnet": "stylegan_for_facerec_tpu/data/mtcnn_weights/pnet.npy",
    "mtcnn_rnet": "stylegan_for_facerec_tpu/data/mtcnn_weights/rnet.npy",
    "mtcnn_onet": "stylegan_for_facerec_tpu/data/mtcnn_weights/onet.npy",
    "moco": "pretrained_models/moco_v2_800ep_pretrain.pth.tar",
}


@dataclasses.dataclass(frozen=True)
class TransformSpec:
    """source kept at native size (None) or resized; gt/test/inference
    resized; everything mapped to [-1, 1]."""

    source_size: Optional[int] = None
    gt_size: Optional[int] = 112
    test_size: Optional[int] = 112
    inference_size: Optional[int] = 112


ENCODE_TRANSFORMS = TransformSpec()                    # EncodeTransforms
CARS_TRANSFORMS = TransformSpec(gt_size=192, test_size=192,
                                inference_size=192)    # CarsEncodeTransforms

DATASETS: Dict[str, dict] = {
    name: {
        "transforms": CARS_TRANSFORMS if name == "cars_encode"
        else ENCODE_TRANSFORMS,
        "train_source_root": DATASET_PATHS.get(src, ""),
        "train_target_root": DATASET_PATHS.get(src, ""),
        "test_source_root": DATASET_PATHS.get(test, ""),
        "test_target_root": DATASET_PATHS.get(test, ""),
    }
    for name, src, test in (
        ("ffhq_encode", "ffhq", "celeba_test"),
        ("cars_encode", "cars_train", "cars_test"),
        ("church_encode", "church_train", "church_test"),
        ("horse_encode", "horse_train", "horse_test"),
        ("afhq_wild_encode", "afhq_wild_train", "afhq_wild_test"),
        ("toonify", "ffhq", "celeba_test"),
        ("AfrAsianFaceSet", "AfrAsianFaceSet", "celeba_test_112p"),
    )
}


def make_datasets(dataset_type: str, demog_labels_file: Optional[str]
                  = None):
    """Build (train_ds, test_ds) ImagesDataset pair from the registry."""
    from .images_dataset import ImagesDataset
    cfg = DATASETS[dataset_type]
    t: TransformSpec = cfg["transforms"]
    train = ImagesDataset(cfg["train_source_root"],
                          cfg["train_target_root"],
                          source_size=t.source_size, target_size=t.gt_size,
                          demog_labels_file=demog_labels_file)
    test = ImagesDataset(cfg["test_source_root"], cfg["test_target_root"],
                         source_size=t.source_size, target_size=t.test_size)
    return train, test
