#!/usr/bin/env python
"""Export a trained model as a standalone StableHLO serving artifact.

The reference has no deployment story beyond "ship the torch checkpoint
and this repo's model code" (``/root/reference/README.md:208``,
``test_RFW.py:41-60``). This CLI writes a ``jax.export`` artifact —
weights baked in, batch dimension symbolic, lowered for an explicit
platform list (default ``tpu,cpu``) — which any JAX process (or a
non-Python PJRT runtime) can run without the framework installed::

    from stylegan_for_facerec_tpu.utils import load_exported
    emb = load_exported("run/export").call(images)   # (b,112,112,3)->(b,E)

Kinds:
  embedder   face-rec backbone, images -> L2-unnormalized embeddings
  generator  StyleGAN2-ADA synthesis, z -> image (const noise)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["embedder", "generator"],
                    default="embedder")
    ap.add_argument("--checkpoint", required=True,
                    help="framework checkpoint/run dir; for --kind "
                    "generator a torch ADA .pt is also accepted")
    ap.add_argument("--out", required=True, help="artifact output dir")
    ap.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering targets")
    ap.add_argument("--batch", type=int, default=None,
                    help="pin the batch dim (default: symbolic 'b')")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    # embedder options (mirrors tools/test_rfw.py)
    ap.add_argument("--backbone", default="pSp")
    ap.add_argument("--emb_size", type=int, default=512)
    ap.add_argument("--image_size", type=int, default=112)
    # generator options (mirrors tools/train_stage2.py's decoder args)
    ap.add_argument("--img_resolution", type=int, default=256)
    ap.add_argument("--z_dim", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stylegan_for_facerec_tpu.utils import export as exu
    from stylegan_for_facerec_tpu.utils.checkpoint import (
        load_checkpoint, load_generator_handoff)

    dtype = getattr(jnp, args.dtype)
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]

    if args.kind == "embedder":
        from stylegan_for_facerec_tpu.models import irse, mobilefacenet, psp
        if args.backbone == "pSp":
            model = psp.PSpFaceRec(size=args.image_size,
                                   emb_size=args.emb_size)
        elif args.backbone == "MobileFaceNet":
            model = mobilefacenet.MobileFaceNet(
                embedding_size=args.emb_size)
        else:
            model = getattr(irse, args.backbone)(args.image_size,
                                                 emb_size=args.emb_size)
        ckpt = load_checkpoint(args.checkpoint)
        params = ckpt["params"].get("backbone", ckpt["params"])
        state = ckpt["state"].get("backbone", ckpt["state"])
        exported = exu.export_embedder(
            model, params, state, image_size=args.image_size, dtype=dtype,
            batch=args.batch, platforms=platforms)
        meta = {"kind": "embedder", "backbone": args.backbone,
                "checkpoint": os.path.abspath(args.checkpoint)}
    else:
        from stylegan_for_facerec_tpu.models import stylegan2_ada
        model = stylegan2_ada.Generator(z_dim=args.z_dim,
                                        img_resolution=args.img_resolution)
        want_p, want_s = model.init(jax.random.key(0))
        params, state, src = load_generator_handoff(
            args.checkpoint, model, want_p, want_s)
        exported = exu.export_generator(
            model, params, state, z_dim=args.z_dim, dtype=dtype,
            batch=args.batch, platforms=platforms)
        meta = {"kind": "generator", "source": src,
                "checkpoint": os.path.abspath(args.checkpoint)}

    exu.save_exported(exported, args.out, metadata=meta)
    size = os.path.getsize(os.path.join(args.out, "artifact.shlo"))
    print(f"exported {args.kind} -> {args.out} "
          f"({size / 1e6:.1f} MB, platforms={platforms}, "
          f"in={[str(a) for a in exported.in_avals]})")


if __name__ == "__main__":
    main()
