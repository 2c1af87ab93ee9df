"""RandAugment — host-side PIL random augmentation.

Parity target: ``/root/reference/data_processing/randaugment.py:9-109``
(present in the reference but not wired into train.py; same here — an
opt-in host transform). Same 13-op menu, the same magnitude ranges, N
defaults to len(ops)//2, M uniform in [0, max_magnitude).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np

OPS: Tuple[str, ...] = (
    "autocontrast", "equalize", "rotate", "solarize", "color", "posterize",
    "contrast", "brightness", "sharpness", "shearX", "shearY",
    "translateX", "translateY")

_FILL = 128


def _ranges():
    return {
        "shearX": np.linspace(0, 0.3, 10),
        "shearY": np.linspace(0, 0.3, 10),
        "translateX": np.linspace(0, 0.2, 10),
        "translateY": np.linspace(0, 0.2, 10),
        "rotate": np.linspace(0, 360, 10),
        "color": np.linspace(0.0, 0.9, 10),
        "posterize": np.round(np.linspace(8, 4, 10), 0).astype(int),
        "solarize": np.linspace(256, 231, 10),
        "contrast": np.linspace(0.0, 0.5, 10),
        "sharpness": np.linspace(0.0, 0.9, 10),
        "brightness": np.linspace(0.0, 0.3, 10),
        "autocontrast": [0] * 10,
        "equalize": [0] * 10,
        "invert": [0] * 10,
    }


class RandAugment:
    def __init__(self, num_ops: Optional[int] = None,
                 max_magnitude: Optional[int] = None):
        self.num_ops = num_ops if num_ops is not None else len(OPS) // 2
        self.max_magnitude = max_magnitude if max_magnitude is not None \
            else 10
        self.ranges = _ranges()

    def _apply(self, img, op: str, mag):
        from PIL import Image, ImageEnhance, ImageOps
        sign = random.choice([-1, 1])
        if op == "shearX":
            return img.transform(img.size, Image.AFFINE,
                                 (1, mag * sign, 0, 0, 1, 0),
                                 Image.BICUBIC, fill=_FILL)
        if op == "shearY":
            return img.transform(img.size, Image.AFFINE,
                                 (1, 0, 0, mag * sign, 1, 0),
                                 Image.BICUBIC, fill=_FILL)
        if op == "translateX":
            return img.transform(img.size, Image.AFFINE,
                                 (1, 0, mag * img.size[0] * sign, 0, 1, 0),
                                 fill=_FILL)
        if op == "translateY":
            return img.transform(img.size, Image.AFFINE,
                                 (1, 0, 0, 0, 1, mag * img.size[1] * sign),
                                 fill=_FILL)
        if op == "rotate":
            rot = img.convert("RGBA").rotate(mag)
            bg = Image.new("RGBA", rot.size, (_FILL,) * 4)
            return Image.composite(rot, bg, rot).convert(img.mode)
        if op == "color":
            return ImageEnhance.Color(img).enhance(1 + mag * sign)
        if op == "posterize":
            return ImageOps.posterize(img, int(mag))
        if op == "solarize":
            return ImageOps.solarize(img, mag)
        if op == "contrast":
            return ImageEnhance.Contrast(img).enhance(1 + mag * sign)
        if op == "sharpness":
            return ImageEnhance.Sharpness(img).enhance(1 + mag * sign)
        if op == "brightness":
            return ImageEnhance.Brightness(img).enhance(1 + mag * sign)
        if op == "autocontrast":
            return ImageOps.autocontrast(img)
        if op == "equalize":
            return img   # reference quirk: 'equalize' is identity (:69)
        if op == "invert":
            return ImageOps.invert(img)
        raise ValueError(op)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        from PIL import Image
        img = Image.fromarray(image)
        mags = np.random.randint(0, self.max_magnitude, self.num_ops)
        ops = np.random.choice(OPS, self.num_ops)
        for op, m in zip(ops, mags):
            img = self._apply(img, str(op), self.ranges[str(op)][m])
        return np.asarray(img)
