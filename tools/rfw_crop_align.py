#!/usr/bin/env python
"""RFW landmark-file crop & align CLI.

Equivalent of ``/root/reference/scripts/rfw_crop_align.py:23-133``: RFW
ships ``*_lmk.txt`` landmark files (no detector needed); warp each image's
5 points to the ArcFace template at the requested resolution and mirror
the folder structure to out_dir.

Landmark file format: ``<relpath> <id?> x1 y1 x2 y2 ... x5 y5`` per line.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mtcnn_crop_align import ldms_transform  # noqa: E402


def parse_lmk_file(path):
    entries = {}
    for line in open(path).read().splitlines():
        f = line.split()
        if len(f) < 11:
            continue
        coords = np.asarray([float(v) for v in f[-10:]], np.float32)
        entries[f[0]] = coords.reshape(5, 2)
    return entries


def main():
    ap = argparse.ArgumentParser("Align RFW images by shipped landmarks.")
    ap.add_argument("--in_dir", required=True)
    ap.add_argument("--lmk_file", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--out_res", type=int, default=112)
    args = ap.parse_args()

    from PIL import Image

    lmks = parse_lmk_file(args.lmk_file)
    n_ok = 0
    for rel, pts in lmks.items():
        src = os.path.join(args.in_dir, rel.lstrip("/"))
        if not os.path.exists(src):
            continue
        try:
            img = np.asarray(Image.open(src).convert("RGB"))
        except Exception:
            print("Error reading", src)
            continue
        crop = ldms_transform(img, pts, args.out_res)
        dst = os.path.join(args.out_dir, rel.lstrip("/"))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        Image.fromarray(crop).save(dst)
        n_ok += 1
    print(f"aligned {n_ok}/{len(lmks)} images")


if __name__ == "__main__":
    main()
