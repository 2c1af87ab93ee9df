#!/usr/bin/env python
"""RB-WebFace TPR@FPR benchmark CLI — equivalent of
``/root/reference/rb-webface/scripts/test_RB_Webface.py:296-319``."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--partition_path", required=True)
    ap.add_argument("--backbone", default="pSp")
    ap.add_argument("--emb_size", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--groups", nargs="+", default=None,
                    help="ethnic groups to evaluate (default: all four, "
                    "test_RB_Webface.py:243)")
    args = ap.parse_args()

    from stylegan_for_facerec_tpu.eval import make_embed_fn
    from stylegan_for_facerec_tpu.eval.rb_webface import evaluate_model
    from stylegan_for_facerec_tpu.models import irse, psp
    from stylegan_for_facerec_tpu.utils.checkpoint import load_checkpoint

    if args.backbone == "pSp":
        backbone = psp.PSpFaceRec(size=112, emb_size=args.emb_size)
    else:
        backbone = getattr(irse, args.backbone)(112,
                                                emb_size=args.emb_size)
    ckpt = load_checkpoint(args.checkpoint)
    params = ckpt["params"].get("backbone", ckpt["params"])
    state = ckpt["state"].get("backbone", ckpt["state"])
    # no flip-TTA and inputs arrive pre-cropped (test_RB_Webface.py:104-111)
    embed_fn = make_embed_fn(backbone, params, state, tta=False,
                             ccrop=False)

    kw = {"groups": tuple(args.groups)} if args.groups else {}
    results = evaluate_model(embed_fn, args.data_path, args.partition_path,
                             batch_size=args.batch_size, **kw)
    for grp, res in results.items():
        print("=" * 20)
        print("Group", grp)
        print("TPR@FPR=1e-3", res["tpr_at_fpr_1e3"])
        print("TPR@FPR=1e-4", res["tpr_at_fpr_1e4"])


if __name__ == "__main__":
    main()
