#!/usr/bin/env python
"""Iterative ReStyle inversion inference CLI.

Equivalent of the reference's ``restyle-encoder/scripts/
inference_iterative.py`` (+ ``encoder_bootstrapping_inference.py`` via
--model_2): invert a folder of images with n refinement iterations, save
per-iteration reconstructions and latents.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_path", required=True)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--exp_dir", required=True)
    ap.add_argument("--n_iters_per_batch", type=int, default=5)
    ap.add_argument("--test_batch_size", type=int, default=8)
    ap.add_argument("--output_size", type=int, default=128)
    ap.add_argument("--model_2_checkpoint_path", default=None,
                    help="enable encoder bootstrapping: model 1 "
                         "initializes, model 2 iterates")
    ap.add_argument("--save_latents", action="store_true")
    ap.add_argument("--avg_image", default=None,
                    help="explicit avg-image .npy (overrides the "
                    "checkpoint-adjacent avg_image.npy lookup)")
    args = ap.parse_args()

    from PIL import Image
    from stylegan_for_facerec_tpu.data.images_dataset import (
        InferenceDataset)
    from stylegan_for_facerec_tpu.eval.inference import (encoder_bootstrap,
                                                         run_on_batch,
                                                         tensor2im)
    from stylegan_for_facerec_tpu.models.psp import PSp
    from stylegan_for_facerec_tpu.utils.checkpoint import load_checkpoint

    model = PSp(output_size=args.output_size)
    ckpt = load_checkpoint(args.checkpoint_path)
    params, state = ckpt["params"], ckpt["state"]
    avg_image = None
    if args.avg_image:
        avg_image = jnp.asarray(np.load(args.avg_image))
        print(f"[init] avg image from {args.avg_image}")
    elif isinstance(ckpt, dict) and "avg_image" in ckpt:
        avg_image = jnp.asarray(ckpt["avg_image"])
    else:
        # the stage-2 CLI exports avg_image.npy next to its checkpoints
        # (coach_restyle_psp.py:88 avg_image.jpg equivalent)
        for d in (args.checkpoint_path,
                  os.path.dirname(args.checkpoint_path.rstrip("/"))):
            p = os.path.join(d, "avg_image.npy")
            if os.path.exists(p):
                avg_image = jnp.asarray(np.load(p))
                print(f"[init] avg image from {p}")
                break
    if avg_image is None:
        print("[warn] no avg_image.npy found next to the checkpoint; "
              "conditioning on a ZERO average image — reconstructions "
              "will degrade (pass --avg_image or keep the stage-2 "
              "export beside the checkpoint)")
        avg_image = jnp.zeros((112, 112, 3))

    model2 = vars2 = None
    if args.model_2_checkpoint_path:
        ck2 = load_checkpoint(args.model_2_checkpoint_path)
        model2 = PSp(output_size=args.output_size)
        vars2 = (ck2["params"], ck2["state"])

    ds = InferenceDataset(args.data_path, size=112)
    os.makedirs(os.path.join(args.exp_dir, "inference_results"),
                exist_ok=True)
    all_latents = {}
    bs = args.test_batch_size
    for i in range(0, len(ds), bs):
        idxs = list(range(i, min(i + bs, len(ds))))
        batch = np.stack([ds[j] for j in idxs])
        pad = bs - len(idxs)
        if pad:
            # full-size zero pad: np.zeros_like(batch[:pad]) caps at the
            # real item count and would leave a ragged (recompiling) batch
            batch = np.concatenate(
                [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
        x = jnp.asarray(batch)
        if model2 is None:
            outs, lats = run_on_batch(model, params, state, x, avg_image,
                                      args.n_iters_per_batch)
        else:
            outs, lats = encoder_bootstrap(model, (params, state), model2,
                                           vars2, x, avg_image,
                                           args.n_iters_per_batch)
        outs = np.asarray(outs)
        for bi, j in enumerate(idxs):
            name = os.path.splitext(os.path.basename(ds.paths[j]))[0]
            Image.fromarray(tensor2im(outs[-1, bi])).save(
                os.path.join(args.exp_dir, "inference_results",
                             f"{name}.jpg"))
            if args.save_latents:
                all_latents[name] = np.asarray(lats[:, bi])
        print(f"[{min(i + bs, len(ds))}/{len(ds)}]")
    if args.save_latents:
        np.save(os.path.join(args.exp_dir, "latents.npy"), all_latents,
                allow_pickle=True)


if __name__ == "__main__":
    main()
