#!/usr/bin/env python
"""Build a flat filelist for stage-2 training.

Equivalent of ``/root/reference/facesets/make_filelist.py:6-23``: walk a
root of image folders and emit one absolute path per line.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True)
    ap.add_argument("--out_file", required=True)
    ap.add_argument("--ext", nargs="+", default=[".jpg", ".jpeg", ".png"])
    args = ap.parse_args()

    from stylegan_for_facerec_tpu.data.images_dataset import list_images
    names = [n for n in list_images(args.in_dir)
             if os.path.splitext(n)[1].lower() in args.ext]
    with open(args.out_file, "w") as f:
        f.write("\n".join(os.path.abspath(n) for n in names) + "\n")
    print(f"wrote {len(names)} paths to {args.out_file}")


if __name__ == "__main__":
    main()
