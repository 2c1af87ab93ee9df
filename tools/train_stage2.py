#!/usr/bin/env python
"""Stage-2 ReStyle pSp encoder training CLI — equivalent of
``scripts/train_restyle_psp.py`` -> ``Coach(opts).train()``
(``/root/reference/restyle-encoder/training/coach_restyle_psp.py``)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source_root", required=True)
    ap.add_argument("--target_root", default=None)
    ap.add_argument("--exp_dir", required=True)
    ap.add_argument("--output_size", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--n_iters_per_batch", type=int, default=1)
    ap.add_argument("--max_steps", type=int, default=2_500_000)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--lpips_lambda", type=float, default=0.8)
    ap.add_argument("--l2_lambda", type=float, default=1.0)
    ap.add_argument("--w_norm_lambda", type=float, default=0.0)
    ap.add_argument("--stylegan_weights", default=None,
                    help="torch ADA checkpoint (G.* keys) to load")
    ap.add_argument("--lpips_weights", default=None,
                    help="npz with converted LPIPS params")
    ap.add_argument("--save_interval", type=int, default=1000)
    ap.add_argument("--image_interval", type=int, default=100,
                    help="dump input/target/output face grids every N "
                    "steps (coach_restyle_psp.py:343-378)")
    ap.add_argument("--image_display_count", type=int, default=2)
    ap.add_argument("--val_root", default=None,
                    help="validation (source[,target]) root; enables the "
                    "coach's periodic validate + best-ckpt tracking "
                    "(coach_restyle_psp.py:192-214)")
    ap.add_argument("--val_interval", type=int, default=1000)
    ap.add_argument("--val_max_batches", type=int, default=20)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in exp_dir "
                    "(params/state/optimizer + step; avg_image.npy is "
                    "reloaded instead of re-estimated)")
    ap.add_argument("--allow_random_lpips", action="store_true",
                    help="proceed with RANDOM-init LPIPS features when no "
                    "--lpips_weights is given (debug only: with the "
                    "README recipe lpips_lambda=0.8 that is 44%% of the "
                    "loss weight on random features)")
    args = ap.parse_args()

    from stylegan_for_facerec_tpu import nn
    from stylegan_for_facerec_tpu.data.images_dataset import ImagesDataset
    from stylegan_for_facerec_tpu.losses import LPIPS
    from stylegan_for_facerec_tpu.train import Stage2Coach, Stage2Config
    from stylegan_for_facerec_tpu.utils.checkpoint import (
        CheckpointManager, load_checkpoint)

    lpips_fn = None
    if args.lpips_lambda > 0:
        lp = LPIPS()
        if args.lpips_weights:
            lpp = load_checkpoint(args.lpips_weights)
        elif args.allow_random_lpips:
            print("[warn] --allow_random_lpips: using RANDOM-init LPIPS "
                  "features (debug only)")
            lpp, _ = lp.init(jax.random.key(99))
        else:
            # the reference cannot hit this state — it downloads the
            # torchvision AlexNet + richzhang lin weights automatically
            # (criteria/lpips/utils.py:11-30). Offline, silent random
            # features would dominate the loss; refuse instead.
            raise SystemExit(
                "lpips_lambda > 0 but no --lpips_weights given. Convert "
                "the torch weights once with tools/convert_checkpoint.py "
                "lpips (losses.perceptual.lpips_params_from_torch), or "
                "pass --lpips_lambda 0, or opt in to random features "
                "with --allow_random_lpips (debug only).")
        lpips_fn = lambda a, b: lp.apply(lpp, {}, (a, b), nn.Ctx())[0]

    cfg = Stage2Config(output_size=args.output_size,
                       n_iters_per_batch=args.n_iters_per_batch,
                       l2_lambda=args.l2_lambda,
                       lpips_lambda=args.lpips_lambda,
                       w_norm_lambda=args.w_norm_lambda,
                       learning_rate=args.learning_rate)
    coach = Stage2Coach(cfg, lpips_fn=lpips_fn)
    params, state, opt_state = coach.init(jax.random.key(0))

    os.makedirs(args.exp_dir, exist_ok=True)
    mgr = CheckpointManager(args.exp_dir)
    start_step = 0
    if args.resume:
        from stylegan_for_facerec_tpu.utils.checkpoint import load_metadata
        latest = mgr.latest()
        if latest is None:
            raise SystemExit(f"--resume: no checkpoint under {args.exp_dir}")
        ckpt = load_checkpoint(latest)
        params, state = ckpt["params"], ckpt["state"]
        if "opt_state" in ckpt:
            opt_state = ckpt["opt_state"]
        else:
            print("[resume] checkpoint predates opt_state saving; "
                  "optimizer slots reinitialized")
        meta = load_metadata(latest)
        # a preempted save is labeled with the NEXT step to run; a
        # periodic save is labeled with the step it completed
        start_step = meta.get("step", 0) + \
            (0 if meta.get("preempted") else 1)
        print(f"[resume] from {latest}, step {start_step}"
              + (" (preempted run)" if meta.get("preempted") else ""))

    if not args.resume and args.stylegan_weights:
        from stylegan_for_facerec_tpu.utils.checkpoint import (
            load_generator_handoff)
        p_dec, s_dec, src = load_generator_handoff(
            args.stylegan_weights, coach.model._children()["decoder"],
            params["decoder"], state["decoder"])
        params["decoder"] = p_dec
        state["decoder"] = s_dec
        print(f"[init] loaded generator weights ({src})")

    if args.resume:
        # latent_avg lives in the restored state; the matching avg_image
        # was exported by the original run
        avg_path = os.path.join(args.exp_dir, "avg_image.npy")
        if not os.path.exists(avg_path):
            raise SystemExit(f"--resume: {avg_path} missing (exported at "
                             "the start of the original run)")
        avg_image = jnp.asarray(np.load(avg_path))
    else:
        state = coach.estimate_latent_avg(params, state, jax.random.key(1),
                                          n_latent=100_000)
        avg_image = coach.make_avg_image(params, state, jax.random.key(2))
        np.save(os.path.join(args.exp_dir, "avg_image.npy"),
                np.asarray(avg_image))

    ds = ImagesDataset(args.source_root,
                       args.target_root or args.source_root)
    print(f"[data] {len(ds)} pairs")
    from stylegan_for_facerec_tpu.eval.inference import face_grid
    from stylegan_for_facerec_tpu.utils.logging import MetricLogger
    logger = MetricLogger(log_dir=os.path.join(args.exp_dir, "logs"))

    val_ds = None
    if args.val_root:
        val_ds = ImagesDataset(args.val_root, args.val_root)
        print(f"[data] {len(val_ds)} val pairs")

    def val_batches():
        for i in range(0, len(val_ds) - args.batch_size + 1,
                       args.batch_size):
            items = [val_ds[j] for j in range(i, i + args.batch_size)]
            yield (jnp.asarray(np.stack([b[0] for b in items])),
                   jnp.asarray(np.stack([b[1] for b in items])))

    def run_validation(step, params, state, key, log=True):
        logs = coach.validate(params, state, val_batches(), avg_image,
                              key, max_batches=args.val_max_batches)
        if log and logs:
            logger.log(step, logs, prefix="val/")
        return logs.get("loss")

    step = start_step
    if len(ds) < args.batch_size:
        raise SystemExit(f"dataset has {len(ds)} pairs < batch_size "
                         f"{args.batch_size}: no full batch can form "
                         f"(the epoch loop would spin forever)")
    # SIGTERM/SIGINT -> finish the in-flight step, checkpoint, exit 0
    # (utils/preempt.py; resume with --resume)
    from stylegan_for_facerec_tpu.utils.preempt import (
        install_preemption_handler)
    stop = install_preemption_handler()
    key = jax.random.key(3)
    if val_ds is not None and not args.resume:
        # step-0 sanity validation, metrics discarded ("inaccurate in
        # first batch", coach_restyle_psp.py:247-250)
        coach.validate(params, state, val_batches(), avg_image,
                       jax.random.key(7), max_batches=5)
    while step < args.max_steps and not stop.is_set():
        order = np.random.permutation(len(ds))
        for i in range(0, len(order) - args.batch_size + 1,
                       args.batch_size):
            batch = [ds[j] for j in order[i: i + args.batch_size]]
            x = jnp.asarray(np.stack([b[0] for b in batch]))
            y = jnp.asarray(np.stack([b[1] for b in batch]))
            key, k = jax.random.split(key)
            params, state, opt_state, loss, logs, y_hat = coach.train_step(
                params, state, opt_state, x, y, avg_image, k)
            if step % 50 == 0:
                logger.log(step, {k2: float(v) for k2, v in logs.items()},
                           prefix="train/")
            if args.image_interval and step % args.image_interval == 0:
                n = min(args.image_display_count, x.shape[0])
                grid = face_grid([{"input_face": x[i], "target_face": y[i],
                                   "output_face": y_hat[i]}
                                  for i in range(n)])
                logger.log_image("images/train/faces", grid, step)
            val_loss = None
            if (val_ds is not None and step > 0
                    and step % args.val_interval == 0):
                key, kv = jax.random.split(key)
                val_loss = run_validation(step, params, state, kv)
            if step % args.save_interval == 0 and step > 0:
                # best-model tracking keyed on VAL loss (coach:192-202);
                # without a val set, use train loss — but never mix the
                # two: the train loss is summed over n_iters_per_batch
                # refinement iterations and is not comparable
                mgr.save(step, {"params": params, "state": state,
                                "opt_state": opt_state},
                         metric=(val_loss if val_loss is not None
                                 else (float(loss) if val_ds is None
                                       else None)))
            step += 1
            if step >= args.max_steps or stop.is_set():
                break
    if stop.is_set():
        mgr.save(step, {"params": params, "state": state,
                        "opt_state": opt_state},
                 metadata={"preempted": True})
        print(f"[preempt] emergency checkpoint at step {step}; resume "
              "with --resume", flush=True)
        logger.close()
        return
    # final save so short runs (and clean exits) always leave a loadable
    # checkpoint (the reference saves a last iteration_N.pt on exit)
    mgr.save(step, {"params": params, "state": state,
                    "opt_state": opt_state})
    logger.close()


if __name__ == "__main__":
    main()
