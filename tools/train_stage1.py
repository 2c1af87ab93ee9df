#!/usr/bin/env python
"""Stage-1 StyleGAN2-ADA GAN pretraining CLI — implements the recipe of
``/root/reference/configs/stage_1_config.yaml`` (the reference delegates
this stage to an external repo)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True,
                    help="unlabeled face images (any folder tree)")
    ap.add_argument("--exp_dir", required=True)
    ap.add_argument("--config", default=None,
                    help="Stage1Config json/yaml (defaults mirror "
                         "stage_1_config.yaml)")
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--fid_interval", type=int, default=0,
                    help="every N steps report embedding-space FID "
                         "between g_ema samples and real images "
                         "(stylegan2-ada-lightning logs Inception FID; "
                         "offline we use IR-SE-50 features, see eval/fid)")
    ap.add_argument("--fid_n", type=int, default=256,
                    help="sample count per side for the FID estimate")
    ap.add_argument("--fid_encoder", default=None,
                    help="IR-SE-50 checkpoint dir for the FID feature "
                         "space; omitted = random-init features (valid "
                         "for RELATIVE progress within this run only)")
    ap.add_argument("--fid_inception", default=None,
                    help="InceptionV3 weights (torchvision/pytorch-fid "
                         ".pth, or a converted native checkpoint dir) — "
                         "makes the FID comparable to published numbers; "
                         "takes precedence over --fid_encoder")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in exp_dir "
                    "(full trainer state: G/D/EMA/optimizers/ADA p + step)")
    args = ap.parse_args()

    from stylegan_for_facerec_tpu.data.images_dataset import (
        InferenceDataset)
    from stylegan_for_facerec_tpu.train.stage1 import Stage1Trainer
    from stylegan_for_facerec_tpu.utils.checkpoint import CheckpointManager
    from stylegan_for_facerec_tpu.utils.config import (Stage1Config,
                                                       load_config)

    cfg = load_config(Stage1Config, args.config) if args.config else \
        Stage1Config(image_size=args.image_size,
                     batch_size=args.batch_size)
    trainer = Stage1Trainer(cfg)
    state = trainer.init(jax.random.key(0))

    ds = InferenceDataset(args.data_root, size=cfg.image_size)
    print(f"[data] {len(ds)} images")
    mgr = CheckpointManager(args.exp_dir)
    start_step = 0
    if args.resume:
        from stylegan_for_facerec_tpu.utils.checkpoint import (
            load_checkpoint, load_metadata)
        latest = mgr.latest()
        if latest is None:
            raise SystemExit(f"--resume: no checkpoint under {args.exp_dir}")
        ckpt = load_checkpoint(latest)
        if "g" not in ckpt:
            # legacy run dirs saved only the {g_ema, g_state} handoff
            # subset — not enough to continue training from
            raise SystemExit(
                f"{latest} holds only the g_ema handoff subset (a run "
                "from before full-state saving); it cannot be resumed")
        state = ckpt
        meta = load_metadata(latest)
        start_step = meta.get("step", 0) + \
            (0 if meta.get("preempted") else 1)
        print(f"[resume] from {latest}, step {start_step}"
              + (" (preempted run)" if meta.get("preempted") else ""))

    compute_fid = None
    if args.fid_interval > 0:
        if args.fid_n < 2:
            raise SystemExit("--fid_n must be >= 2 (covariance needs at "
                             "least two samples per side)")
        from stylegan_for_facerec_tpu import nn as nn_lib
        from stylegan_for_facerec_tpu.eval.fid import embedding_fid
        from stylegan_for_facerec_tpu.models import irse
        from stylegan_for_facerec_tpu.ops.image import resize_bilinear

        if args.fid_inception:
            # real-Inception FID (VERDICT r3 next #6): comparable to the
            # published stylegan2-ada-lightning numbers. Accepts the
            # torchvision/pytorch-fid torch checkpoint directly or a
            # converted native checkpoint dir.
            from stylegan_for_facerec_tpu.models.inception import (
                InceptionV3)
            enc = InceptionV3()
            if os.path.isdir(args.fid_inception):
                from stylegan_for_facerec_tpu.utils.checkpoint import (
                    load_checkpoint)
                ck = load_checkpoint(args.fid_inception)
                e_params, e_state = ck["params"], ck["state"]
            else:
                from stylegan_for_facerec_tpu.utils.torch_convert import (
                    from_torch, load_torch_checkpoint)
                sd = load_torch_checkpoint(args.fid_inception)
                sd = sd.get("state_dict", sd)
                # drop heads the feature extractor does not own
                sd = {k: v for k, v in sd.items()
                      if not k.startswith(("fc.", "AuxLogits."))}
                e_params, e_state = from_torch(enc, sd)
            print("[fid] InceptionV3-pool3 feature space "
                  f"({args.fid_inception})")

            @jax.jit
            def _embed_p(p, s, x):
                y, _ = enc.apply(p, s, x, nn_lib.Ctx(train=False))
                return y
        else:
            enc = irse.IR_SE_50(112)
            if args.fid_encoder:
                from stylegan_for_facerec_tpu.utils.checkpoint import (
                    load_checkpoint)
                ck = load_checkpoint(args.fid_encoder)
                e_params = ck["params"].get("backbone", ck["params"])
                e_state = ck["state"].get("backbone", ck["state"])
            else:
                print("[fid] no --fid_encoder/--fid_inception: random-init "
                      "IR-SE-50 feature space; the metric tracks RELATIVE "
                      "progress only")
                e_params, e_state = enc.init(jax.random.key(11))

            # params as jit ARGUMENTS, never closure constants: the axon
            # remote-compile helper rejects >~100MB serialized bodies with
            # HTTP 413 (CLAUDE.md; IR-SE-50 is ~170MB f32)
            @jax.jit
            def _embed_p(p, s, x):
                y, _ = enc.apply(p, s, resize_bilinear(x, 112, 112),
                                 nn_lib.Ctx(train=False))
                return y

        def _embed(x):
            return _embed_p(e_params, e_state, x)

        @jax.jit
        def _synth(g_ema, g_state, z, k):
            img, _ = trainer.G.apply(
                g_ema, g_state, z, nn_lib.Ctx(train=False, rng=k),
                noise_mode="random")
            return img

        fid_bs = min(32, args.fid_n)

        def compute_fid(state, key):
            n = (args.fid_n // fid_bs) * fid_bs
            idx = np.random.permutation(len(ds))[:n]
            reals = np.stack([np.asarray(ds[j]) for j in idx])
            fakes = []
            for i in range(0, n, fid_bs):
                key, kz, kn = jax.random.split(key, 3)
                z = jax.random.normal(kz, (fid_bs, cfg.z_dim))
                fakes.append(np.asarray(
                    _synth(state["g_ema"], state["g_state"], z, kn)))
            return embedding_fid(_embed, reals,
                                 np.concatenate(fakes), batch_size=fid_bs)

    step = start_step
    key = jax.random.key(1)
    max_steps = args.max_steps or cfg.num_epochs * cfg.batches_per_epoch
    if len(ds) < cfg.batch_size:
        raise SystemExit(f"dataset has {len(ds)} images < batch_size "
                         f"{cfg.batch_size}: no full batch can form "
                         f"(the epoch loop would spin forever)")
    # SIGTERM/SIGINT -> finish the in-flight step, checkpoint, exit 0
    # (utils/preempt.py; resume with --resume)
    from stylegan_for_facerec_tpu.utils.preempt import (
        install_preemption_handler)
    stop = install_preemption_handler()
    while step < max_steps and not stop.is_set():
        order = np.random.permutation(len(ds))
        for i in range(0, len(order) - cfg.batch_size + 1, cfg.batch_size):
            reals = jnp.asarray(np.stack(
                [ds[j] for j in order[i: i + cfg.batch_size]]))
            key, k = jax.random.split(key)
            # host-side step avoids a per-iteration device sync
            state, logs = trainer.train_step(state, reals, k, step=step)
            if step % 50 == 0:
                print(f"step {step} " + " ".join(
                    f"{k2} {float(v):.4f}" for k2, v in logs.items()))
            if step % 2000 == 0 and step > 0:
                # FULL trainer state (g/d/opts/ADA p/...), not just the
                # {g_ema, g_state} handoff subset — every periodic save is
                # then resumable, and load_generator_handoff still finds
                # its g_ema key
                mgr.save(step, state)
            if (compute_fid is not None and step > 0
                    and step % args.fid_interval == 0):
                key, kf = jax.random.split(key)
                print(f"step {step} fid512 {compute_fid(state, kf):.3f}")
            step += 1
            if step >= max_steps or stop.is_set():
                break
    if stop.is_set():
        mgr.save(step, state, metadata={"preempted": True})
        print(f"[preempt] emergency checkpoint at step {step}; resume "
              "with --resume", flush=True)
        return
    # final save so short runs always leave a loadable (and resumable)
    # checkpoint, like the other three training CLIs
    mgr.save(step, state)


if __name__ == "__main__":
    main()
