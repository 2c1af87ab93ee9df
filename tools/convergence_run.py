#!/usr/bin/env python
"""Long-run real-TPU convergence evidence (VERDICT r2 next #10).

Trains the production stage-3 step (IR-SE-50 @112, ArcFace s=64 m=0.5,
SGD momentum + warmup, bf16 compute, packed uint8 pipeline with in-step
augmentation) for a few thousand steps on a synthetic-identity dataset
large enough to be non-trivial (default 512 identities x 40 images),
and reports monotone-ish loss decrease + top1 far above chance.

The reference's corresponding claim is implicit in its training recipe
(``train.py:287-345``); the known ArcFace-from-scratch plateau
(``README.md:210-212``) is mitigated the same way the reference
recommends: LR warmup.

Usage (on the TPU host):
  python tools/convergence_run.py --steps 3000 --out /tmp/convergence
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_packed(root, n_ids, per_id, size=128, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    n = n_ids * per_id
    shard_size = 2048
    labels = np.repeat(np.arange(n_ids), per_id).astype(np.int32)
    perm = rng.permutation(n)
    labels = labels[perm]
    # identity prototypes: low-frequency random fields (separable smooth)
    base = rng.rand(n_ids, 16, 16, 3).astype(np.float32)
    protos = np.stack([np.kron(b, np.ones((8, 8, 1)))[:size, :size]
                       for b in base])
    protos = (protos * 255).astype(np.float32)
    n_shards = -(-n // shard_size)
    idx = 0
    for s in range(n_shards):
        take = min(shard_size, n - idx)
        lab = labels[idx: idx + take]
        noise = rng.randn(take, size, size, 3).astype(np.float32) * 20
        imgs = np.clip(protos[lab] + noise, 0, 255).astype(np.uint8)
        np.save(os.path.join(root, f"shard-{s:05d}.npy"), imgs)
        idx += take
    np.save(os.path.join(root, "labels.npy"), labels)
    from stylegan_for_facerec_tpu.data import save_packed_meta
    save_packed_meta(root, size, n, shard_size, n_shards,
                     [f"id{i}" for i in range(n_ids)])
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--n_ids", type=int, default=512)
    ap.add_argument("--per_id", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--out", default="/tmp/convergence")
    ap.add_argument("--data", default=None,
                    help="existing packed dir (skips synthesis)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from stylegan_for_facerec_tpu.data import (PackedLoader,
                                               PackedTrainDataset,
                                               device_prefetch)
    from stylegan_for_facerec_tpu.models import irse
    from stylegan_for_facerec_tpu.train import Stage3Config, Stage3Trainer

    os.makedirs(args.out, exist_ok=True)
    data_dir = args.data or os.path.join(args.out, "packed")
    if args.data is None and not os.path.exists(
            os.path.join(data_dir, "packed_meta.json")):
        print(f"[data] synthesizing {args.n_ids}x{args.per_id} packed "
              f"images -> {data_dir}", flush=True)
        make_packed(data_dir, args.n_ids, args.per_id)
    ds = PackedTrainDataset(data_dir)
    print(f"[data] {len(ds)} images, {ds.n_identities} ids; device="
          f"{jax.devices()[0]}", flush=True)

    cfg = Stage3Config(num_classes=ds.n_identities,
                       batch_size=args.batch_size, lr=args.lr,
                       warmup_batches=args.warmup,
                       freeze_backbone_epochs=0, stages=(),
                       augment_crop=112)
    trainer = Stage3Trainer(irse.IR_SE_50(112), cfg, steps_per_epoch=1000)
    params, state, opt = trainer.init(jax.random.key(0))
    key = jax.random.key(1)

    log_path = os.path.join(args.out, "train.jsonl")
    logf = open(log_path, "a")
    losses, top1s = [], []
    step = 0
    t_start = time.time()
    pending = None
    while step < args.steps:
        loader = PackedLoader(ds, args.batch_size, seed=step)
        for images, labels in device_prefetch(iter(loader)):
            key, k = jax.random.split(key)
            params, state, opt, metrics = trainer.train_step(
                params, state, opt, images, labels, k,
                jnp.asarray(step), None)
            if pending is not None:
                st, m = pending
                loss, t1 = float(m["loss"]), float(m["top1"])
                losses.append(loss)
                top1s.append(t1)
                if st % 50 == 0:
                    row = {"step": st, "loss": round(loss, 4),
                           "top1": round(t1, 4),
                           "lr": round(float(m["lr"]), 5),
                           "elapsed_s": round(time.time() - t_start, 1)}
                    logf.write(json.dumps(row) + "\n")
                    logf.flush()
                    print(row, flush=True)
            pending = (step, metrics)
            step += 1
            if step >= args.steps:
                break
    if pending is not None:          # drain the final step's metrics
        st, m = pending
        loss, t1 = float(m["loss"]), float(m["top1"])
        losses.append(loss)
        top1s.append(t1)
        row = {"step": st, "loss": round(loss, 4), "top1": round(t1, 4),
               "lr": round(float(m["lr"]), 5),
               "elapsed_s": round(time.time() - t_start, 1)}
        logf.write(json.dumps(row) + "\n")
        logf.flush()
        print(row, flush=True)
    dt = time.time() - t_start
    early = float(np.mean(losses[:50]))
    late = float(np.mean(losses[-50:]))
    final_top1 = float(np.mean(top1s[-50:]))
    chance = 1.0 / ds.n_identities
    summary = {"steps": step, "seconds": round(dt, 1),
               "imgs_per_sec_e2e": round(step * args.batch_size / dt, 1),
               "loss_first50": round(early, 4),
               "loss_last50": round(late, 4),
               "top1_last50": round(final_top1, 4),
               "chance": round(chance, 5),
               "device": str(jax.devices()[0])}
    logf.write(json.dumps({"summary": summary}) + "\n")
    logf.close()
    print("SUMMARY", json.dumps(summary), flush=True)
    ok = late < 0.5 * early and final_top1 > 50 * chance
    print("CONVERGENCE_OK" if ok else "CONVERGENCE_WEAK", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
