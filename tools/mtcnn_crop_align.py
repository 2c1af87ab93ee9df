#!/usr/bin/env python
"""MTCNN crop & align CLI.

Equivalent of ``/root/reference/facesets/mtcnn_crop_align.py:23-173``:
scan a folder tree (or a filelist), square-pad each image with zeros,
detect faces (min_face_size 100, strict thresholds), similarity-warp every
detected face's 5 landmarks to 112x112 (the Tencent/TFace reference
points, x += 8 for the square crop), and write
``<out_dir>/<tag>/<name>_<face_no>.jpg``.
"""

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


ARC_SRC = np.array([
    [30.2946, 51.6963], [65.5318, 51.5014], [48.0252, 71.7366],
    [33.5493, 92.3655], [62.7299, 92.2041]], np.float32)


def ldms_transform(img, landmark5, out_res):
    """TFace-style 5-point similarity warp (``rfw_crop_align.py:23-56``)."""
    import cv2
    from stylegan_for_facerec_tpu.models.mtcnn import (
        find_nonreflective_similarity)
    src = ARC_SRC.copy()
    src[:, 0] += 8.0
    src *= out_res / 112.0
    T, _ = find_nonreflective_similarity(
        np.asarray(landmark5, np.float64), src.astype(np.float64))
    M = T[:, 0:2].T.astype(np.float32)
    return cv2.warpAffine(img, M, (out_res, out_res), borderValue=0.0)


def square_pad(img):
    """Zero-pad to square (``mtcnn_crop_align.py`` square-pad step)."""
    h, w = img.shape[:2]
    if h > w:
        pad = h - w
        img = np.hstack([np.zeros_like(img)[:, :pad // 2], img,
                         np.zeros_like(img)[:, :pad // 2 + pad % 2]])
    elif w > h:
        pad = w - h
        img = np.vstack([np.zeros_like(img)[:pad // 2], img,
                         np.zeros_like(img)[:pad // 2 + pad % 2]])
    return img


def process_one(det, name, out_dir, out_res, min_face_size, thresholds):
    from PIL import Image
    try:
        img = np.asarray(Image.open(name).convert("RGB"))
    except Exception:
        print("Error reading", name)
        return 0
    img = square_pad(img)
    try:
        boxes, landmarks = det.detect_faces(
            Image.fromarray(img), min_face_size=min_face_size,
            thresholds=thresholds, nms_thresholds=(0.9, 0.9, 0.9))
    except ValueError:
        print("detector ValueError on", name)
        return 0
    if len(landmarks) == 0:
        return 0
    tag = name.split(os.sep)[-2]
    count = 0
    for face_no, lm in enumerate(landmarks):
        pts = np.stack([lm[:5], lm[5:10]], axis=1)
        crop = ldms_transform(img, pts, out_res)
        out_name = os.path.join(
            out_dir, tag, os.path.basename(name) + f"_{face_no}.jpg")
        os.makedirs(os.path.dirname(out_name), exist_ok=True)
        Image.fromarray(crop).save(out_name)
        count += 1
    return count


def main():
    ap = argparse.ArgumentParser(
        "Crop & align faces with MTCNN in a folder tree.")
    ap.add_argument("--in_dir", type=str)
    ap.add_argument("--in_list", type=str, default=None)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--out_res", type=int, default=112)
    ap.add_argument("--min_face_size", type=float, default=100.0)
    ap.add_argument("--threshold", type=float, nargs=3,
                    default=(0.9, 0.9, 0.9))
    ap.add_argument("--n_threads", type=int, default=8)
    args = ap.parse_args()

    from stylegan_for_facerec_tpu.data.images_dataset import list_images
    from stylegan_for_facerec_tpu.models.mtcnn import MTCNN

    names = (open(args.in_list).read().splitlines() if args.in_list
             else list_images(args.in_dir))
    det = MTCNN()
    total = 0
    # detector calls are jit-cached per pyramid shape; IO parallelized
    with ThreadPoolExecutor(args.n_threads) as pool:
        for n in pool.map(lambda nm: process_one(
                det, nm, args.out_dir, args.out_res, args.min_face_size,
                tuple(args.threshold)), names):
            total += n
    print(f"aligned {total} faces from {len(names)} images")


if __name__ == "__main__":
    main()
