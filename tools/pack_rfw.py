#!/usr/bin/env python
"""Pack RFW-style verification pairs into the framework's .npz format.

Equivalent of ``/root/reference/scripts/pack_RFW_in_bcolz.py:10-67``:
reads a ``<pairs>.txt`` (``name1 name2 label`` or the RFW 3/4-column
format), loads the aligned 112x112 images, interleaves src/tgt as
consecutive entries in a (2N, 112, 112, 3) float32 [-1,1] array, and
writes ``<out>.npz`` with arrays 'images' and 'issame'.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_img(path, size):
    from PIL import Image
    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - 0.5) / 0.5


def _is_int(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False


def parse_pairs(pairs_file, image_root):
    """RFW pairs format: 'id img1 img2' (same) or 'id1 img1 id2 img2'
    (diff) — ``pack_RFW_in_bcolz.py:27-45``; also accepts
    'path1 path2 label'. A 3-column line whose middle field is an integer
    is ALWAYS an RFW positive pair: 'm.0123 4 1' means images 4 and 1 of
    one identity, not (path, path='1', label) — image numbers <= 1 are
    common and must not trip the path-pair branch."""
    pairs = []
    for line in open(pairs_file).read().splitlines():
        f = line.split()
        if not f:
            continue
        if len(f) == 3 and f[2] in ("0", "1") and not _is_int(f[1]):
            pairs.append((f[0], f[1], f[2] == "1"))
        elif len(f) == 3:
            ident, a, b = f
            pairs.append((os.path.join(ident, f"{ident}_{int(a):04d}.jpg"),
                          os.path.join(ident, f"{ident}_{int(b):04d}.jpg"),
                          True))
        elif len(f) == 4:
            id1, a, id2, b = f
            pairs.append((os.path.join(id1, f"{id1}_{int(a):04d}.jpg"),
                          os.path.join(id2, f"{id2}_{int(b):04d}.jpg"),
                          False))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", required=True)
    ap.add_argument("--image_root", required=True)
    ap.add_argument("--out", required=True, help="output prefix (no ext)")
    ap.add_argument("--size", type=int, default=112)
    args = ap.parse_args()

    pairs = parse_pairs(args.pairs, args.image_root)
    images = np.zeros((2 * len(pairs), args.size, args.size, 3), np.float32)
    issame = np.zeros(len(pairs), bool)
    for i, (a, b, same) in enumerate(pairs):
        images[2 * i] = load_img(os.path.join(args.image_root, a),
                                 args.size)
        images[2 * i + 1] = load_img(os.path.join(args.image_root, b),
                                     args.size)
        issame[i] = same
    np.savez_compressed(args.out + ".npz", images=images, issame=issame)
    print(f"packed {len(pairs)} pairs -> {args.out}.npz")


if __name__ == "__main__":
    main()
