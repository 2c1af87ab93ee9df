#!/usr/bin/env python
"""Pack a labeled training image tree into pre-decoded uint8 shards.

Train-side analog of ``tools/pack_rfw.py`` (the reference packs only eval
pairs, ``scripts/pack_RFW_in_bcolz.py``): decodes every image of a
``<root>/<identity>/<file>.jpg`` tree ONCE (C++ fastloader when built)
and writes memory-mappable uint8 NHWC shards + labels + metadata. Train
epochs then read from page cache instead of re-decoding JPEGs, so the
host pipeline can feed the TPU step at full speed (SURVEY §7 hard-part 8).

Usage:
  python tools/pack_train.py --root data/bupt/imgs --out data/bupt/packed
  python tools/train_stage3.py --config ... --packed_dir data/bupt/packed
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="<root>/<identity>/*.jpg training tree")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--image_size", type=int, default=128,
                    help="packed side length (train.py:109-117 resizes "
                    "to 128 before the on-device RandomCrop(112))")
    ap.add_argument("--shard_size", type=int, default=8192,
                    help="images per shard file")
    ap.add_argument("--num_workers", type=int, default=8)
    args = ap.parse_args()

    from stylegan_for_facerec_tpu.data import FacesDataset, pack_dataset
    ds = FacesDataset(args.root, image_size=args.image_size)
    if len(ds) == 0:
        raise SystemExit(f"no images under {args.root}")
    print(f"[pack] {len(ds)} images, {ds.n_identities} identities "
          f"-> {args.out}")
    meta = pack_dataset(ds, args.out, shard_size=args.shard_size,
                        num_workers=args.num_workers)
    gb = meta["n_images"] * meta["image_size"] ** 2 * 3 / 1e9
    print(f"[pack] done: {meta['n_shards']} shards, {gb:.2f} GB uint8")


if __name__ == "__main__":
    main()
