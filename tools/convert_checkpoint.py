#!/usr/bin/env python
"""Checkpoint conversion CLI: reference torch .pt/.pth <-> our framework
format.

- ``to_jax``: load a torch checkpoint (stage-2 pSp/e4e bundles, ADA
  generator 'G.*' dumps, plain backbone state_dicts) into our parameter
  trees and save via utils.checkpoint.
- ``to_torch``: export a framework checkpoint back to a torch-loadable
  state_dict (.pt) for the reference toolchain.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

# checkpoint conversion is pure host work: don't route 100s of MB of
# parameter uploads/readbacks through the TPU tunnel
jax.config.update("jax_platforms", "cpu")


def build_model(kind: str, **kw):
    from stylegan_for_facerec_tpu.models import irse, psp, stylegan2_ada
    if kind == "ir50":
        return irse.IR_50(112), {"output_layer.3": (7, 7, 512)}
    if kind == "ir_se50":
        return irse.IR_SE_50(112), {"output_layer.3": (7, 7, 512)}
    if kind == "psp_facerec":
        return psp.PSpFaceRec(size=112), \
            {"encoder.output_layer.3": (7, 7, 512)}
    if kind == "psp":
        return psp.PSp(output_size=kw.get("output_size", 128)), {}
    if kind == "ada_generator":
        return stylegan2_ada.Generator(
            img_resolution=kw.get("output_size", 256)), {}
    raise SystemExit(f"unknown model kind {kind!r}")


def convert_lpips(src: str, alexnet: str, dst: str):
    """Turn the richzhang lin weights (+ torchvision AlexNet features
    state_dict) into the npz tree ``tools/train_stage2.py
    --lpips_weights`` loads — the offline equivalent of the reference's
    auto-download (``criteria/lpips/utils.py:11-30``)."""
    from stylegan_for_facerec_tpu.losses.perceptual import (
        lpips_params_from_torch)
    from stylegan_for_facerec_tpu.utils import torch_convert as tc
    from stylegan_for_facerec_tpu.utils.checkpoint import save_checkpoint

    lin_sd = tc.load_torch_checkpoint(src)
    lin_sd = {k.replace("lin", "").replace("model.", ""): v
              for k, v in lin_sd.items()}  # utils.py:22-30 renames
    alex_sd = tc.load_torch_checkpoint(alexnet)
    alex_sd = alex_sd.get("state_dict", alex_sd)
    feats = {k[len("features."):]: v for k, v in alex_sd.items()
             if k.startswith("features.")} or alex_sd
    params = lpips_params_from_torch(feats, lin_sd)
    save_checkpoint(dst, params, metadata={"source": src})
    print(f"converted LPIPS weights -> {dst}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("direction", choices=["to_jax", "to_torch"])
    ap.add_argument("--model", required=True,
                    help="ir50|ir_se50|psp_facerec|psp|ada_generator|lpips")
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--output_size", type=int, default=128)
    ap.add_argument("--key_prefix", default="",
                    help="e.g. 'encoder' to slice a pSp bundle, 'G' for "
                         "ADA-lightning generator dumps")
    ap.add_argument("--alexnet", default=None,
                    help="torchvision alexnet state_dict .pth "
                    "(lpips only)")
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()

    from stylegan_for_facerec_tpu.utils import torch_convert as tc
    from stylegan_for_facerec_tpu.utils.checkpoint import (load_checkpoint,
                                                           save_checkpoint)

    if args.model == "lpips":
        if args.direction != "to_jax" or not args.alexnet:
            raise SystemExit("lpips conversion: use to_jax with --src "
                             "<richzhang lin .pth> --alexnet "
                             "<torchvision alexnet .pth>")
        convert_lpips(args.src, args.alexnet, args.dst)
        return

    model, flatten_info = build_model(args.model,
                                      output_size=args.output_size)

    if args.direction == "to_jax":
        ckpt = tc.load_torch_checkpoint(args.src)
        sd = ckpt.get("state_dict", ckpt)
        if args.key_prefix:
            p = args.key_prefix + "."
            sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
        params, state = tc.from_torch(model, sd,
                                      flatten_info=flatten_info,
                                      strict=args.strict)
        save_checkpoint(args.dst, {"params": params, "state": state},
                        metadata={"source": args.src,
                                  "model": args.model})
        print(f"converted {len(sd)} torch tensors -> {args.dst}")
    else:
        import torch
        tree = load_checkpoint(args.src)
        params = tree["params"]
        state = tree.get("state", {})
        sd = tc.to_torch(model, params, state, flatten_info=flatten_info)
        torch.save({k: torch.tensor(v) for k, v in sd.items()}, args.dst)
        print(f"exported {len(sd)} tensors -> {args.dst}")


if __name__ == "__main__":
    main()
