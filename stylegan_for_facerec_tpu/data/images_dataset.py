"""Stage-2 (source, target) image-pair datasets.

Parity targets: ``/root/reference/restyle-encoder/datasets/images_dataset.py``
(``ImagesDataset``: paired dirs or a .txt filelist, optional demographic
labels), ``inference_dataset.py``, ``gt_res_dataset.py``, and the transform
registry (``configs/transforms_config.py:20-49``: gt/test resized to
112x112, source kept as-is, everything normalized to [-1, 1]).
"""

from __future__ import annotations

import os
from glob import glob
from typing import List, Optional, Sequence, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp")


def list_images(root: str) -> List[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(IMG_EXTENSIONS):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _load_image(path: str, size: Optional[int]) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    if size is not None and img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - 0.5) / 0.5


class ImagesDataset:
    """(from_im, to_im) pairs; roots may be directories or .txt filelists
    (one path per line, ``images_dataset.py:6-59``)."""

    def __init__(self, source_root: str, target_root: str,
                 source_size: Optional[int] = 112,
                 target_size: Optional[int] = 112,
                 demog_labels_file: Optional[str] = None):
        self.source_paths = self._resolve(source_root)
        self.target_paths = self._resolve(target_root)
        self.source_size = source_size
        self.target_size = target_size
        self.demog = None
        if demog_labels_file:
            lines = open(demog_labels_file).read().splitlines()
            self.demog = {l.split()[0]: int(l.split()[1]) for l in lines}

    @staticmethod
    def _resolve(root: str) -> List[str]:
        if root.endswith(".txt"):
            return open(root).read().splitlines()
        return list_images(root)

    def __len__(self):
        return len(self.source_paths)

    def __getitem__(self, idx: int):
        from_im = _load_image(self.source_paths[idx], self.source_size)
        to_im = _load_image(self.target_paths[idx], self.target_size)
        if self.demog is not None:
            name = os.path.basename(self.source_paths[idx])
            return from_im, to_im, self.demog.get(name, 0)
        return from_im, to_im


class InferenceDataset:
    """``inference_dataset.py:6-21``: single-image dataset for inversion."""

    def __init__(self, root: str, size: Optional[int] = 112):
        self.paths = ImagesDataset._resolve(root)
        self.size = size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int):
        return _load_image(self.paths[idx], self.size)


class GTResDataset:
    """``gt_res_dataset.py:6-28``: (result, gt) pairs by matching relative
    filenames, for loss-eval scripts."""

    def __init__(self, root_path: str, gt_dir: str,
                 size: Optional[int] = None):
        self.pairs = []
        for f in list_images(root_path):
            gt = os.path.join(gt_dir, os.path.basename(f))
            if os.path.exists(gt):
                self.pairs.append((f, gt))
        self.size = size

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx: int):
        res, gt = self.pairs[idx]
        return _load_image(res, self.size), _load_image(gt, self.size)
