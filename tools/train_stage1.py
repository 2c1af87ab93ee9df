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

    step = 0
    key = jax.random.key(1)
    max_steps = args.max_steps or cfg.num_epochs * cfg.batches_per_epoch
    if len(ds) < cfg.batch_size:
        raise SystemExit(f"dataset has {len(ds)} images < batch_size "
                         f"{cfg.batch_size}: no full batch can form "
                         f"(the epoch loop would spin forever)")
    while step < max_steps:
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
                mgr.save(step, {"g_ema": state["g_ema"],
                                "g_state": state["g_state"]})
            step += 1
            if step >= max_steps:
                break


if __name__ == "__main__":
    main()
