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
    if "id" in args.mode:
        # calc_id_loss_parallel.py equivalence: 1 - <emb(result), emb(gt)>
        from stylegan_for_facerec_tpu.losses.identity import (
            make_irse_id_extractor)
        if args.id_checkpoint:
            from stylegan_for_facerec_tpu.utils.checkpoint import (
                load_checkpoint)
            ck = load_checkpoint(args.id_checkpoint)
            id_p, id_s = ck["params"], ck["state"]
        else:
            print("[warn] random-init ID backbone (no --id_checkpoint)")
            from stylegan_for_facerec_tpu.models.irse import Backbone
            id_p, id_s = Backbone(input_size=112, num_layers=50,
                                  mode="ir_se", drop_ratio=0.6).init(
                                      jax.random.key(1))
        extract = make_irse_id_extractor(id_p, id_s)

        @jax.jit
        def id_batch(a, b):
            ea, eb = extract(a), extract(b)
            return 1.0 - jnp.sum(ea * eb, axis=1)
        fns["id"] = id_batch

    scores = {m: [] for m in fns}
    # pad the ragged tail so every pair is scored with ONE compiled shape
    for i in range(0, len(ds), args.batch_size):
        batch = [ds[j] for j in range(i, min(i + args.batch_size,
                                             len(ds)))]
        n = len(batch)
        a = np.stack([b[0] for b in batch])
        b = np.stack([b[1] for b in batch])
        pad = args.batch_size - n
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:],
                                            a.dtype)])
            b = np.concatenate([b, np.zeros((pad,) + b.shape[1:],
                                            b.dtype)])
        for m, fn in fns.items():
            scores[m].extend(np.asarray(fn(jnp.asarray(a),
                                           jnp.asarray(b)))[:n].tolist())

    out = {m: {"mean": float(np.mean(v)), "std": float(np.std(v))}
           for m, v in scores.items() if v}
    print(json.dumps(out, indent=2))
    with open(os.path.join(args.data_path, "stat_losses.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
