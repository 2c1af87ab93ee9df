#!/usr/bin/env python
"""Stage-2 ReStyle e4e encoder training CLI — equivalent of
``scripts/train_restyle_e4e.py`` -> ``Coach(opts).train()``
(``/root/reference/restyle-encoder/training/coach_restyle_e4e.py``)."""

import argparse
import os
import sys

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
    ap.add_argument("--w_discriminator_lambda", type=float, default=0.1)
    ap.add_argument("--delta_norm_lambda", type=float, default=2e-4)
    ap.add_argument("--progressive_steps", type=int, nargs="*", default=[])
    ap.add_argument("--d_reg_every", type=int, default=16)
    ap.add_argument("--stylegan_weights", default=None)
    ap.add_argument("--lpips_weights", default=None)
    ap.add_argument("--save_interval", type=int, default=1000)
    ap.add_argument("--image_interval", type=int, default=100)
    ap.add_argument("--image_display_count", type=int, default=2)
    ap.add_argument("--val_root", default=None)
    ap.add_argument("--val_interval", type=int, default=1000)
    ap.add_argument("--val_max_batches", type=int, default=20)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in exp_dir "
                    "(params/state/optimizers/discriminator + step; "
                    "avg_image.npy is reloaded instead of re-estimated)")
    ap.add_argument("--allow_random_lpips", action="store_true",
                    help="proceed with RANDOM-init LPIPS features when no "
                    "--lpips_weights is given (debug only)")
    args = ap.parse_args()

    from stylegan_for_facerec_tpu import nn
    from stylegan_for_facerec_tpu.data.images_dataset import ImagesDataset
    from stylegan_for_facerec_tpu.losses import LPIPS
    from stylegan_for_facerec_tpu.train.stage2_e4e import (E4eCoach,
                                                           E4eConfig)
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
            # same guard as tools/train_stage2.py: the reference
            # auto-downloads these weights (criteria/lpips/utils.py:11-30);
            # offline, silently training against random features would
            # dominate the loss at the recipe's lpips_lambda
            raise SystemExit(
                "lpips_lambda > 0 but no --lpips_weights given. Convert "
                "the torch weights once with tools/convert_checkpoint.py "
                "lpips, or pass --lpips_lambda 0, or opt in with "
                "--allow_random_lpips (debug only).")
        lpips_fn = lambda a, b: lp.apply(lpp, {}, (a, b), nn.Ctx())[0]

    cfg = E4eConfig(output_size=args.output_size,
                    n_iters_per_batch=args.n_iters_per_batch,
                    l2_lambda=args.l2_lambda,
                    lpips_lambda=args.lpips_lambda,
                    learning_rate=args.learning_rate,
                    w_discriminator_lambda=args.w_discriminator_lambda,
                    delta_norm_lambda=args.delta_norm_lambda,
                    progressive_steps=tuple(args.progressive_steps),
                    d_reg_every=args.d_reg_every)
    coach = E4eCoach(cfg, lpips_fn=lpips_fn)
    params, state, opt_state, d_params, d_opt = coach.init(
        jax.random.key(0))

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
        d_params = ckpt.get("d_params", d_params)
        if "opt_state" in ckpt:
            opt_state, d_opt = ckpt["opt_state"], ckpt["d_opt"]
        else:
            print("[resume] checkpoint predates optimizer saving; "
                  "optimizer slots reinitialized")
        meta = load_metadata(latest)
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
    cur_stage = -1
    key = jax.random.key(3)
    while step < args.max_steps and not stop.is_set():
        order = np.random.permutation(len(ds))
        for i in range(0, len(order) - args.batch_size + 1,
                       args.batch_size):
            if cfg.progressive_steps:
                stage = coach.stage_for_step(step)
                if stage != cur_stage:
                    coach.set_stage(stage)
                    cur_stage = stage
                    print(f"[progressive] stage -> {stage}")
            batch = [ds[j] for j in order[i: i + args.batch_size]]
            x = jnp.asarray(np.stack([b[0] for b in batch]))
            y = jnp.asarray(np.stack([b[1] for b in batch]))
            key, k1, k2 = jax.random.split(key, 3)
            params, state, opt_state, loss, logs, y_hat, latent = \
                coach.train_step(params, state, opt_state, x, y, avg_image,
                                 k1, d_params)
            if cfg.w_discriminator_lambda > 0:
                d_params, d_opt, d_loss = coach.train_discriminator(
                    params, state, d_params, d_opt, x, avg_image, k2, step)
            if step % 50 == 0:
                extra = ({"d_loss": float(d_loss)}
                         if cfg.w_discriminator_lambda > 0 else {})
                logger.log(step, {**{k3: float(v)
                                     for k3, v in logs.items()}, **extra},
                           prefix="train/")
            if args.image_interval and step % args.image_interval == 0:
                n = min(args.image_display_count, x.shape[0])
                grid = face_grid([{"input_face": x[i2], "target_face":
                                   y[i2], "output_face": y_hat[i2]}
                                  for i2 in range(n)])
                logger.log_image("images/train/faces", grid, step)
            val_loss = None
            if (val_ds is not None and step > 0
                    and step % args.val_interval == 0):
                key, kv = jax.random.split(key)
                # d_params included: the reference e4e validate() composes
                # the full loss incl. the adversarial encoder term
                vlogs = coach.validate(params, state, val_batches(),
                                       avg_image, kv,
                                       max_batches=args.val_max_batches,
                                       d_params=d_params)
                if vlogs:
                    logger.log(step, vlogs, prefix="val/")
                    val_loss = vlogs.get("loss")
            if step % args.save_interval == 0 and step > 0:
                # best tracked on ONE consistent quantity: val loss when a
                # val set exists, train loss otherwise (train loss sums
                # refinement iterations — not comparable with val loss)
                mgr.save(step, {"params": params, "state": state,
                                "d_params": d_params,
                                "opt_state": opt_state, "d_opt": d_opt},
                         metric=(val_loss if val_loss is not None
                                 else (float(loss) if val_ds is None
                                       else None)))
            step += 1
            if step >= args.max_steps or stop.is_set():
                break
    if stop.is_set():
        mgr.save(step, {"params": params, "state": state,
                        "d_params": d_params,
                        "opt_state": opt_state, "d_opt": d_opt},
                 metadata={"preempted": True})
        print(f"[preempt] emergency checkpoint at step {step}; resume "
              "with --resume", flush=True)
        logger.close()
        return
    mgr.save(step, {"params": params, "state": state, "d_params": d_params,
                    "opt_state": opt_state, "d_opt": d_opt})
    logger.close()


if __name__ == "__main__":
    main()
