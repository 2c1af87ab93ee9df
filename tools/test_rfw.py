#!/usr/bin/env python
"""RFW (and LFW-style) verification benchmark CLI — the equivalent of
``/root/reference/test_RFW.py:12-169``: load a checkpoint, build the
backbone, run 10-fold verification on every requested benchmark."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="framework checkpoint dir (utils.checkpoint)")
    ap.add_argument("--data_root", required=True,
                    help="dir with packed <name>.npz eval sets")
    ap.add_argument("--benchmarks", nargs="+",
                    default=["rfw_African", "rfw_Asian", "rfw_Caucasian",
                             "rfw_Indian"])
    ap.add_argument("--backbone", default="pSp")
    ap.add_argument("--emb_size", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--no_tta", action="store_true")
    ap.add_argument("--roc_dir", default=None,
                    help="write per-benchmark ROC curve images here "
                    "(util/utils.py:239-251 gen_plot parity)")
    args = ap.parse_args()

    from stylegan_for_facerec_tpu.eval import load_val_pair, perform_val
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

    logger = None
    if args.roc_dir:
        from stylegan_for_facerec_tpu.utils.logging import MetricLogger
        logger = MetricLogger(log_dir=args.roc_dir)
    for bench in args.benchmarks:
        carray, issame = load_val_pair(os.path.join(args.data_root, bench))
        acc, thr, roc = perform_val(backbone, params, state, carray,
                                    issame, batch_size=args.batch_size,
                                    emb_size=args.emb_size,
                                    tta=not args.no_tta)
        print(f"{bench}: accuracy {acc:.4f} best_threshold {thr:.3f}")
        if logger is not None:
            logger.log_benchmark(0, bench, acc, thr, roc=roc)


if __name__ == "__main__":
    main()
