"""MTCNN face detector / 5-point aligner.

Parity target: ``/root/reference/restyle-encoder/models/mtcnn/`` (the
mtcnn-pytorch lineage): PNet/RNet/ONet cascades (``src/get_nets.py``),
image-pyramid proposals at factor 0.707 (``mtcnn.py:60-104``,
``src/first_stage.py``), numpy NMS/box calibration (``src/box_utils.py``),
and 5-point similarity-transform alignment to 112x112
(``src/align_trans.py``, ``src/matlab_cp2tform.py`` — a Matlab cp2tform
port).

TPU-native split: the three conv nets run as jitted NHWC JAX functions
(pretrained weights vendored as the public .npy dicts the reference ships);
pyramid building, NMS, box math, and the final cv2 warp stay host-side
numpy. The box math is restructured here (vectorized all-pairs NMS,
clip-algebra correct_bboxes) but reproduces box_utils.py numerics exactly
— oracle tests pin parity against the upstream module.
"""

from __future__ import annotations

import functools
import math
import os
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "..", "data",
                           "mtcnn_weights")


# ---------------------------------------------------------------------------
# Networks (NHWC jax; weights from the torch-named .npy dicts)
# ---------------------------------------------------------------------------

def _conv(x, w_oihw, b, stride=1):
    w = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)), x.dtype)
    y = lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(b, x.dtype)


def _prelu(x, a):
    a = jnp.asarray(a, x.dtype)
    return jnp.where(x >= 0, x, a * x)


def _maxpool_ceil(x, k, s):
    """torch MaxPool2d(ceil_mode=True): pad high side so the last partial
    window counts (with -inf fill)."""
    n, h, w, c = x.shape
    oh = -(-(h - k) // s) + 1
    ow = -(-(w - k) // s) + 1
    ph = max((oh - 1) * s + k - h, 0)
    pw = max((ow - 1) * s + k - w, 0)
    y = lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                          (1, s, s, 1),
                          [(0, 0), (0, ph), (0, pw), (0, 0)])
    return y


def _caffe_flatten(x):
    """get_nets.Flatten: NCHW ``x.transpose(3, 2)`` then flatten — i.e.
    (C, W, H) ordering. From NHWC: transpose to (N, C, W, H)."""
    return jnp.transpose(x, (0, 3, 2, 1)).reshape(x.shape[0], -1)


def _linear(x, w_oi, b):
    return x @ jnp.asarray(w_oi, x.dtype).T + jnp.asarray(b, x.dtype)


@functools.lru_cache(maxsize=12)
def _load_weights(name: str, weights_dir: Optional[str] = None) -> dict:
    # the directory is part of the cache key: a cache keyed on the net
    # name alone would hand a custom-weights_dir detector the arrays of
    # whichever directory loaded first
    path = os.path.join(weights_dir or WEIGHTS_DIR, f"{name}.npy")
    return np.load(path, allow_pickle=True)[()]


def pnet_apply(weights: dict, x: jax.Array):
    """PNet (``get_nets.py:32-75``); x NHWC preprocessed. Returns
    (offsets (N,h,w,4), probs (N,h,w,2))."""
    w = weights
    x = _prelu(_conv(x, w["features.conv1.weight"],
                     w["features.conv1.bias"]), w["features.prelu1.weight"])
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(_conv(x, w["features.conv2.weight"],
                     w["features.conv2.bias"]), w["features.prelu2.weight"])
    x = _prelu(_conv(x, w["features.conv3.weight"],
                     w["features.conv3.bias"]), w["features.prelu3.weight"])
    a = _conv(x, w["conv4_1.weight"], w["conv4_1.bias"])
    b = _conv(x, w["conv4_2.weight"], w["conv4_2.bias"])
    # Parity note: upstream applies softmax over dim=-1 of the NCHW map —
    # the WIDTH axis, not the class axis (get_nets.py:74, a quirk of this
    # fork). The fork's very low stage-1 threshold (0.15, mtcnn.py:46) was
    # tuned against that behavior, so we reproduce it exactly: width is
    # axis 2 in our NHWC layout.
    a = jax.nn.softmax(a, axis=2)
    return b, a


def rnet_apply(weights: dict, x: jax.Array):
    w = weights
    x = _prelu(_conv(x, w["features.conv1.weight"],
                     w["features.conv1.bias"]), w["features.prelu1.weight"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv(x, w["features.conv2.weight"],
                     w["features.conv2.bias"]), w["features.prelu2.weight"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv(x, w["features.conv3.weight"],
                     w["features.conv3.bias"]), w["features.prelu3.weight"])
    x = _caffe_flatten(x)
    x = _prelu(_linear(x, w["features.conv4.weight"],
                       w["features.conv4.bias"]),
               w["features.prelu4.weight"])
    a = jax.nn.softmax(_linear(x, w["conv5_1.weight"], w["conv5_1.bias"]),
                       axis=-1)
    b = _linear(x, w["conv5_2.weight"], w["conv5_2.bias"])
    return b, a


def onet_apply(weights: dict, x: jax.Array):
    w = weights
    x = _prelu(_conv(x, w["features.conv1.weight"],
                     w["features.conv1.bias"]), w["features.prelu1.weight"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv(x, w["features.conv2.weight"],
                     w["features.conv2.bias"]), w["features.prelu2.weight"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv(x, w["features.conv3.weight"],
                     w["features.conv3.bias"]), w["features.prelu3.weight"])
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(_conv(x, w["features.conv4.weight"],
                     w["features.conv4.bias"]), w["features.prelu4.weight"])
    x = _caffe_flatten(x)
    x = _prelu(_linear(x, w["features.conv5.weight"],
                       w["features.conv5.bias"]),
               w["features.prelu5.weight"])
    a = jax.nn.softmax(_linear(x, w["conv6_1.weight"], w["conv6_1.bias"]),
                       axis=-1)
    b = _linear(x, w["conv6_2.weight"], w["conv6_2.bias"])
    c = _linear(x, w["conv6_3.weight"], w["conv6_3.bias"])
    return c, b, a


# ---------------------------------------------------------------------------
# Host-side box math (box_utils.py parity)
# ---------------------------------------------------------------------------

def _pairwise_overlap(boxes: np.ndarray, mode: str) -> np.ndarray:
    """All-pairs overlap matrix for (x1, y1, x2, y2[, ...]) rows under the
    MTCNN +1-inclusive pixel-area convention. mode 'union' = IoU;
    'min' = intersection over the smaller area."""
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    iw = np.minimum(x2[:, None], x2[None, :]) \
        - np.maximum(x1[:, None], x1[None, :]) + 1.0
    ih = np.minimum(y2[:, None], y2[None, :]) \
        - np.maximum(y1[:, None], y1[None, :]) + 1.0
    inter = np.maximum(iw, 0.0) * np.maximum(ih, 0.0)
    if mode == "min":
        return inter / np.minimum(area[:, None], area[None, :])
    return inter / (area[:, None] + area[None, :] - inter)


def nms(boxes: np.ndarray, overlap_threshold: float = 0.5,
        mode: str = "union") -> List[int]:
    """Greedy non-maximum suppression; selection semantics match
    ``box_utils.py:5-68`` (descending-score greedy pick, suppress strictly
    ``overlap > threshold``, same +1-inclusive areas and tie order).
    Formulated as one vectorized all-pairs overlap matrix plus an alive
    mask instead of upstream's per-pick re-slicing — candidate counts after
    thresholding are small, so the O(n^2) matrix is cheaper than n passes
    of fancy indexing."""
    n = len(boxes)
    if n == 0:
        return []
    overlap = _pairwise_overlap(boxes, mode)
    # np.argsort ascending traversed back-to-front == upstream's pick order
    order = np.argsort(boxes[:, 4])[::-1]
    alive = np.ones(n, dtype=bool)
    pick: List[int] = []
    for i in order:
        if not alive[i]:
            continue
        pick.append(int(i))
        alive &= overlap[i] <= overlap_threshold
    return pick


def convert_to_square(bboxes: np.ndarray) -> np.ndarray:
    """Expand each box to the enclosing square about its center
    (semantics of ``box_utils.py:71-91``; score/extra columns return
    zeroed — every caller reassigns them from the next stage's probs)."""
    x1, y1, x2, y2 = (bboxes[:, i] for i in range(4))
    w = x2 - x1 + 1.0
    h = y2 - y1 + 1.0
    side = np.maximum(h, w)
    sx1 = x1 + w * 0.5 - side * 0.5
    sy1 = y1 + h * 0.5 - side * 0.5
    square = np.zeros_like(bboxes)
    square[:, :4] = np.stack(
        [sx1, sy1, sx1 + side - 1.0, sy1 + side - 1.0], axis=1)
    return square


def calibrate_box(bboxes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Apply the regression offsets, scaled by box width/height
    (semantics of ``box_utils.py:94-124``)."""
    sizes = bboxes[:, 2:4] - bboxes[:, 0:2] + 1.0   # (n, 2) = (w, h)
    out = bboxes.copy()
    out[:, :4] += np.tile(sizes, 2) * offsets
    return out


def correct_bboxes(bboxes, width, height):
    """Clip boxes to the image and return the crop/paste bookkeeping the
    cropper needs (semantics of ``box_utils.py:162-223``). Returns int32
    [dy, edy, dx, edx, y, ey, x, ex, w, h]: (x..ex, y..ey) is the clipped
    source window, (dx..edx, dy..edy) its destination inside the w x h
    padded crop. Upstream mutates via boolean masks; clip/offset algebra
    is equivalent: e.g. edx = (w-1) + (min(ex, width-1) - ex) collapses
    its conditional ``w + width - 2 - ex`` branch."""
    x1, y1, x2, y2 = (bboxes[:, i] for i in range(4))
    w = x2 - x1 + 1.0
    h = y2 - y1 + 1.0
    x = np.maximum(x1, 0.0)
    y = np.maximum(y1, 0.0)
    ex = np.minimum(x2, width - 1.0)
    ey = np.minimum(y2, height - 1.0)
    dx = x - x1
    dy = y - y1
    edx = (w - 1.0) + (ex - x2)
    edy = (h - 1.0) + (ey - y2)
    return [v.astype("int32") for v in
            [dy, edy, dx, edx, y, ey, x, ex, w, h]]


def preprocess(img: np.ndarray) -> np.ndarray:
    """``box_utils.py:226-238`` adapted to NHWC: (img - 127.5)/128."""
    return ((np.asarray(img, np.float32) - 127.5) * 0.0078125)[None]


def get_image_boxes(bounding_boxes, img, size=24) -> np.ndarray:
    """``box_utils.py:127-159``: crop+pad boxes, resize to size, NHWC."""
    from PIL import Image
    num = len(bounding_boxes)
    width, height = img.size
    dy, edy, dx, edx, y, ey, x, ex, w, h = correct_bboxes(
        bounding_boxes, width, height)
    out = np.zeros((num, size, size, 3), "float32")
    img_array = np.asarray(img, "uint8")
    for i in range(num):
        if h[i] <= 0 or w[i] <= 0:
            continue
        box = np.zeros((h[i], w[i], 3), "uint8")
        box[dy[i]:edy[i] + 1, dx[i]:edx[i] + 1] = \
            img_array[y[i]:ey[i] + 1, x[i]:ex[i] + 1]
        box = Image.fromarray(box).resize((size, size), Image.BILINEAR)
        out[i] = (np.asarray(box, "float32") - 127.5) * 0.0078125
    return out


# ---------------------------------------------------------------------------
# Alignment (align_trans / matlab_cp2tform parity)
# ---------------------------------------------------------------------------

REFERENCE_FACIAL_POINTS = np.array([
    [30.29459953, 51.69630051], [65.53179932, 51.50139999],
    [48.02519989, 71.73660278], [33.54930115, 92.3655014],
    [62.72990036, 92.20410156]], np.float32)
DEFAULT_CROP_SIZE = (96, 112)


def get_reference_facial_points(output_size=None, inner_padding_factor=0.0,
                                outer_padding=(0, 0),
                                default_square=False) -> np.ndarray:
    """``align_trans.py:32-135`` (the paths exercised by the pipeline)."""
    pts = REFERENCE_FACIAL_POINTS.copy()
    crop = np.array(DEFAULT_CROP_SIZE, np.float32)
    if default_square:
        diff = crop.max() - crop
        pts += diff / 2
        crop += diff
    if output_size is None or tuple(np.asarray(output_size)) == \
            tuple(crop.astype(int)):
        if inner_padding_factor == 0 and tuple(outer_padding) == (0, 0):
            return pts
    if output_size is None:
        size_diff = crop * inner_padding_factor * 2
        output_size = tuple((crop + size_diff
                             + np.asarray(outer_padding) * 2).astype(int))
    # scale inner region then shift by outer padding
    size_bf_outer = np.asarray(output_size) - np.asarray(outer_padding) * 2
    scale = size_bf_outer[0] / (crop[0] * (1 + inner_padding_factor * 2))
    pts = (pts + crop * inner_padding_factor) * scale
    pts = pts + np.asarray(outer_padding)
    return pts.astype(np.float32)


def find_nonreflective_similarity(uv: np.ndarray, xy: np.ndarray):
    """``matlab_cp2tform.py:68-116``: least-squares [sc, ss, tx, ty]."""
    M = xy.shape[0]
    x = xy[:, 0:1]
    y = xy[:, 1:2]
    X = np.vstack([np.hstack([x, y, np.ones((M, 1)), np.zeros((M, 1))]),
                   np.hstack([y, -x, np.zeros((M, 1)), np.ones((M, 1))])])
    U = np.vstack([uv[:, 0:1], uv[:, 1:2]])
    r, _, _, _ = np.linalg.lstsq(X, U, rcond=None)
    sc, ss, tx, ty = np.squeeze(r)
    Tinv = np.array([[sc, -ss, 0], [ss, sc, 0], [tx, ty, 1]])
    T = np.linalg.inv(Tinv)
    T[:, 2] = [0, 0, 1]
    return T, Tinv


def get_similarity_transform_for_cv2(src_pts, dst_pts,
                                     reflective=True) -> np.ndarray:
    """``matlab_cp2tform.py:119-260``: pick the better of direct vs
    Y-reflected similarity; emit the 2x3 cv2 matrix."""
    uv, xy = np.asarray(src_pts, np.float64), np.asarray(dst_pts,
                                                         np.float64)
    trans1, _ = find_nonreflective_similarity(uv, xy)
    if reflective:
        xyR = xy.copy()
        xyR[:, 0] *= -1
        trans2r, _ = find_nonreflective_similarity(uv, xyR)
        reflect = np.diag([-1.0, 1.0, 1.0])
        trans2 = trans2r @ reflect
        uv1 = np.hstack([uv, np.ones((uv.shape[0], 1))])
        norm1 = np.linalg.norm((uv1 @ trans1)[:, :2] - xy)
        norm2 = np.linalg.norm((uv1 @ trans2)[:, :2] - xy)
        trans = trans1 if norm1 <= norm2 else trans2
    else:
        trans = trans1
    return trans[:, 0:2].T.astype(np.float32)   # 2x3 cv2 layout


def warp_and_crop_face(src_img, facial_pts, reference_pts=None,
                       crop_size=(112, 112)):
    """``align_trans.py:223-304`` (similarity path)."""
    import cv2
    if reference_pts is None:
        if crop_size == (96, 112):
            reference_pts = REFERENCE_FACIAL_POINTS
        else:
            reference_pts = get_reference_facial_points(
                crop_size, 0, (0, 0), False)
    src_pts = np.float32(facial_pts)
    ref_pts = np.float32(reference_pts)
    if src_pts.shape[0] == 2:
        src_pts = src_pts.T
    if ref_pts.shape[0] == 2:
        ref_pts = ref_pts.T
    tfm = get_similarity_transform_for_cv2(src_pts, ref_pts)
    face = cv2.warpAffine(np.asarray(src_img), tfm,
                          (crop_size[0], crop_size[1]))
    return face, tfm


# ---------------------------------------------------------------------------
# Detector
# ---------------------------------------------------------------------------

class MTCNN:
    """``mtcnn.py:12-156``. Device nets are jitted per input shape (the
    pyramid reuses compiled shapes across images of equal size)."""

    def __init__(self, weights_dir: Optional[str] = None):
        self.pnet_w = _load_weights("pnet", weights_dir)
        self.rnet_w = _load_weights("rnet", weights_dir)
        self.onet_w = _load_weights("onet", weights_dir)
        self._pnet = jax.jit(lambda x: pnet_apply(self.pnet_w, x))
        self._rnet = jax.jit(lambda x: rnet_apply(self.rnet_w, x))
        self._onet = jax.jit(lambda x: onet_apply(self.onet_w, x))
        self.reference = get_reference_facial_points(default_square=True)

    # -- stage 1 -----------------------------------------------------------

    def _run_first_stage(self, image, scale, threshold):
        """``first_stage.py:11-47``."""
        from PIL import Image
        width, height = image.size
        sw, sh = math.ceil(width * scale), math.ceil(height * scale)
        img = image.resize((sw, sh), Image.BILINEAR)
        x = jnp.asarray(preprocess(np.asarray(img, "float32")))
        offsets, probs = self._pnet(x)
        probs = np.asarray(probs)[0, :, :, 1]
        offsets = np.asarray(offsets)[0]          # (h, w, 4)
        boxes = self._generate_bboxes(probs, offsets, scale, threshold)
        if len(boxes) == 0:
            return None
        keep = nms(boxes[:, 0:5], overlap_threshold=0.5)
        return boxes[keep]

    @staticmethod
    def _generate_bboxes(probs, offsets, scale, threshold):
        """``first_stage.py:50-100``."""
        stride, cell = 2, 12
        inds = np.where(probs > threshold)
        if inds[0].size == 0:
            return np.array([])
        offs = offsets[inds[0], inds[1]].T        # (4, n)
        score = probs[inds[0], inds[1]]
        boxes = np.vstack([
            np.round((stride * inds[1] + 1.0) / scale),
            np.round((stride * inds[0] + 1.0) / scale),
            np.round((stride * inds[1] + 1.0 + cell) / scale),
            np.round((stride * inds[0] + 1.0 + cell) / scale),
            score, offs])
        return boxes.T

    # -- full cascade ------------------------------------------------------

    def detect_faces(self, image, min_face_size=20.0,
                     thresholds=(0.15, 0.25, 0.35),
                     nms_thresholds=(0.7, 0.7, 0.7)):
        """``mtcnn.py:45-156``; the fork's low default thresholds kept."""
        width, height = image.size
        min_length = min(height, width)
        min_detection_size = 12
        factor = 0.707
        scales = []
        m = min_detection_size / min_face_size
        min_length *= m
        factor_count = 0
        while min_length > min_detection_size:
            scales.append(m * factor ** factor_count)
            min_length *= factor
            factor_count += 1

        bounding_boxes = [self._run_first_stage(image, s, thresholds[0])
                          for s in scales]
        bounding_boxes = [b for b in bounding_boxes if b is not None]
        if not bounding_boxes:
            return [], []
        bounding_boxes = np.vstack(bounding_boxes)
        keep = nms(bounding_boxes[:, 0:5], nms_thresholds[0])
        bounding_boxes = bounding_boxes[keep]
        bounding_boxes = calibrate_box(bounding_boxes[:, 0:5],
                                       bounding_boxes[:, 5:])
        bounding_boxes = convert_to_square(bounding_boxes)
        bounding_boxes[:, 0:4] = np.round(bounding_boxes[:, 0:4])

        # stage 2
        img_boxes = get_image_boxes(bounding_boxes, image, size=24)
        if len(img_boxes) == 0:
            return [], []
        offsets, probs = self._rnet(jnp.asarray(img_boxes))
        offsets, probs = np.asarray(offsets), np.asarray(probs)
        keep = np.where(probs[:, 1] > thresholds[1])[0]
        bounding_boxes = bounding_boxes[keep]
        bounding_boxes[:, 4] = probs[keep, 1]
        offsets = offsets[keep]
        keep = nms(bounding_boxes, nms_thresholds[1])
        bounding_boxes = calibrate_box(bounding_boxes[keep], offsets[keep])
        bounding_boxes = convert_to_square(bounding_boxes)
        bounding_boxes[:, 0:4] = np.round(bounding_boxes[:, 0:4])

        # stage 3
        img_boxes = get_image_boxes(bounding_boxes, image, size=48)
        if len(img_boxes) == 0:
            return [], []
        landmarks, offsets, probs = self._onet(jnp.asarray(img_boxes))
        landmarks = np.asarray(landmarks)
        offsets, probs = np.asarray(offsets), np.asarray(probs)
        keep = np.where(probs[:, 1] > thresholds[2])[0]
        bounding_boxes = bounding_boxes[keep]
        bounding_boxes[:, 4] = probs[keep, 1]
        offsets = offsets[keep]
        landmarks = landmarks[keep]
        w = bounding_boxes[:, 2] - bounding_boxes[:, 0] + 1.0
        h = bounding_boxes[:, 3] - bounding_boxes[:, 1] + 1.0
        landmarks = landmarks.copy()
        landmarks[:, 0:5] = bounding_boxes[:, 0:1] + w[:, None] \
            * landmarks[:, 0:5]
        landmarks[:, 5:10] = bounding_boxes[:, 1:2] + h[:, None] \
            * landmarks[:, 5:10]
        bounding_boxes = calibrate_box(bounding_boxes, offsets)
        keep = nms(bounding_boxes, nms_thresholds[2], mode="min")
        return bounding_boxes[keep], landmarks[keep]

    def align(self, img):
        """``mtcnn.py:23-29``: single face -> 112x112 aligned crop."""
        from PIL import Image
        _, landmarks = self.detect_faces(img)
        if len(landmarks) == 0:
            return None, None
        pts = [[landmarks[0][j], landmarks[0][j + 5]] for j in range(5)]
        warped, tfm = warp_and_crop_face(np.array(img), pts, self.reference,
                                         crop_size=(112, 112))
        return Image.fromarray(warped), tfm

    @staticmethod
    def show_bboxes(img, bounding_boxes, facial_landmarks=()):
        """``mtcnn_pytorch/src/visualization_utils.py``: draw detections."""
        from PIL import ImageDraw
        img = img.copy()
        draw = ImageDraw.Draw(img)
        for b in bounding_boxes:
            draw.rectangle([(b[0], b[1]), (b[2], b[3])], outline="white")
        for lm in facial_landmarks:
            for i in range(5):
                draw.ellipse([(lm[i] - 1, lm[i + 5] - 1),
                              (lm[i] + 1, lm[i + 5] + 1)], outline="blue")
        return img

    def align_multi(self, img, limit=None, min_face_size=30.0):
        """``mtcnn.py:31-43``."""
        from PIL import Image
        boxes, landmarks = self.detect_faces(img, min_face_size)
        if limit:
            boxes = boxes[:limit]
            landmarks = landmarks[:limit]
        faces, tfms = [], []
        for lm in landmarks:
            pts = [[lm[j], lm[j + 5]] for j in range(5)]
            warped, tfm = warp_and_crop_face(np.array(img), pts,
                                            self.reference,
                                            crop_size=(112, 112))
            faces.append(Image.fromarray(warped))
            tfms.append(tfm)
        return boxes, faces, tfms
