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
    ap.add_argument("--int8", action="store_true",
                    help="ALSO evaluate the int8 PTQ serving path "
                    "(utils/quantize.py; calibrated on the first "
                    "benchmark's first images) and print the accuracy "
                    "delta vs f32")
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
    table = lean = None
    for bench in args.benchmarks:
        carray, issame = load_val_pair(os.path.join(args.data_root, bench))
        acc, thr, roc = perform_val(backbone, params, state, carray,
                                    issame, batch_size=args.batch_size,
                                    emb_size=args.emb_size,
                                    tta=not args.no_tta)
        print(f"{bench}: accuracy {acc:.4f} best_threshold {thr:.3f}")
        if args.int8:
            import jax.numpy as jnp
            import numpy as np
            from stylegan_for_facerec_tpu.utils import quantize as q
            if table is None:
                # calibrate once on real eval images (center-cropped to
                # the backbone's input, as the embed path will see them)
                imgs = np.asarray(carray[:32], np.float32)
                if imgs.shape[1] == 3:
                    imgs = np.moveaxis(imgs, 1, -1)
                off = (imgs.shape[1] - 112) // 2
                if off > 0:
                    imgs = imgs[:, off:off + 112, off:off + 112]
                table = q.calibrate_and_quantize(
                    backbone, params, state,
                    [jnp.asarray(imgs[i:i + 8]) for i in (0, 8, 16, 24)])
                lean = q.strip_quantized_weights(params, table)
            acc8, thr8, _ = perform_val(backbone, lean, state, carray,
                                        issame, batch_size=args.batch_size,
                                        emb_size=args.emb_size,
                                        tta=not args.no_tta,
                                        int8_table=table)
            print(f"{bench}: int8 accuracy {acc8:.4f} "
                  f"(delta {acc8 - acc:+.4f}) best_threshold {thr8:.3f}")
        if logger is not None:
            logger.log_benchmark(0, bench, acc, thr, roc=roc)


if __name__ == "__main__":
    main()
