#!/usr/bin/env python
"""Real-TPU smoke of the user-facing CLIs (VERDICT r1 next-round #6).

Generates a tiny synthetic dataset + packed verification pair, then runs
the three user-facing entry points as SUBPROCESSES exactly as a user
would, on whatever backend `python` resolves to (the axon TPU chip under
the driver; CPU if forced):

  1. tools/train_stage3.py  — tiny IR_50 config, 1 epoch, eval + ckpt
  2. tools/test_rfw.py      — verification on the packed pair + ROC image
  3. tools/train_stage2.py  — 3 steps of pSp refinement at 32px

Writes a VERIFIED.md section with the commands and observed tails.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_data(root, n_ids=6, n_imgs=6, size=128, n_pairs=12):
    import numpy as np
    from PIL import Image
    rng = np.random.RandomState(0)
    train = os.path.join(root, "faces")
    protos = rng.rand(n_ids, size, size, 3)
    for i in range(n_ids):
        d = os.path.join(train, f"id{i}")
        os.makedirs(d, exist_ok=True)
        for j in range(n_imgs):
            arr = np.clip(protos[i] + rng.randn(size, size, 3) * 0.08,
                          0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                os.path.join(d, f"{j}.jpg"), quality=95)
    # RB-WebFace layout: partition txt files list image names relative to
    # data_dir; positives come in 5-image identity groups
    part = os.path.join(root, "partition")
    os.makedirs(part, exist_ok=True)
    pos = [f"id{i % n_ids}/{j}.jpg" for i in range(2) for j in range(5)]
    neg = [f"id{(i + 1) % n_ids}/{i % n_imgs}.jpg" for i in range(6)]
    with open(os.path.join(part, "pos_pairs_samples_Smoke.txt"), "w") as f:
        f.write("\n".join(pos))
    with open(os.path.join(part, "neg_pairs_samples_Smoke.txt"), "w") as f:
        f.write("\n".join(neg))
    # packed verification pair (our native .npz layout, see
    # eval/verify_runner.load_val_pair)
    imgs, issame = [], []
    for p in range(n_pairs):
        same = p % 2 == 0
        a = rng.randint(n_ids)
        b = a if same else (a + 1 + rng.randint(n_ids - 1)) % n_ids
        for ident in (a, b):
            arr = np.clip(protos[ident] +
                          rng.randn(size, size, 3) * 0.08, 0, 1)
            imgs.append((arr * 2 - 1).astype(np.float32))
        issame.append(same)
    np.savez(os.path.join(root, "rfw_Smoke.npz"),
             images=np.stack(imgs), issame=np.asarray(issame))
    return train


def run(cmd, timeout, env=None):
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout, env=env)
    dt = time.time() - t0
    tail = (proc.stdout + proc.stderr)[-1500:]
    return proc.returncode, dt, tail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/sgfr_smoke")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-CLI subprocess timeout (first TPU compiles "
                    "are minutes)")
    ap.add_argument("--report", default=os.path.join(REPO, "VERIFIED.md"))
    ap.add_argument("--platform", default="default",
                    choices=("default", "cpu", "tpu"),
                    help="force the CLIs' jax backend via SGFR_PLATFORM "
                    "(default: whatever `python` resolves to)")
    ap.add_argument("--only", nargs="+", default=None,
                    help="run only these CLI names (e.g. train_stage2)")
    ap.add_argument("--retries", type=int, default=1,
                    help="re-run a failed CLI this many times — the dev "
                    "tunnel's remote-compile helper fails transiently "
                    "(dropped response bodies); a retry hits the compile "
                    "cache and usually succeeds")
    args = ap.parse_args()

    env = dict(os.environ)
    # persistent compile cache for EVERY platform: retries only help if
    # they hit the cache, and default (real-TPU) first compiles cost
    # minutes through the remote-compile helper
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    if args.platform != "default":
        env["SGFR_PLATFORM"] = args.platform

    os.makedirs(args.workdir, exist_ok=True)
    train_root = make_data(args.workdir)

    cfg = {
        "name": "smoke", "data_root": args.workdir, "train_subdir": "faces",
        "model_root": os.path.join(args.workdir, "ckpt"),
        "backbone": "IR_50", "head": "ArcFace", "batch_size": 8,
        "num_epochs": 1, "freeze_backbone_epochs": 0, "dropout": 0.0,
        "num_workers": 2, "eval_benchmarks": ["rfw_Smoke"],
        "stages": [], "emb_size": 512,
    }
    cfg_path = os.path.join(args.workdir, "stage3_smoke.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    py = sys.executable
    results = []

    results.append(("train_stage3", [py, "tools/train_stage3.py",
                                     "--config", cfg_path,
                                     "--max_steps", "3"]))
    packed_dir = os.path.join(args.workdir, "packed")
    results.append(("pack_train", [py, "tools/pack_train.py",
                                   "--root", train_root,
                                   "--out", packed_dir,
                                   "--shard_size", "16",
                                   "--num_workers", "2"]))
    results.append(("train_stage3_packed", [py, "tools/train_stage3.py",
                                            "--config", cfg_path,
                                            "--packed_dir", packed_dir,
                                            "--max_steps", "3"]))
    results.append(("test_rfw", [py, "tools/test_rfw.py",
                                 "--checkpoint",
                                 os.path.join(args.workdir, "ckpt",
                                              "smoke"),
                                 "--data_root", args.workdir,
                                 "--benchmarks", "rfw_Smoke",
                                 "--backbone", "IR_50",
                                 "--batch_size", "8",
                                 "--roc_dir",
                                 os.path.join(args.workdir, "roc")]))
    results.append(("test_rb_webface", [py, "tools/test_rb_webface.py",
                                        "--checkpoint",
                                        os.path.join(args.workdir, "ckpt",
                                                     "smoke"),
                                        "--data_path", train_root,
                                        "--partition_path",
                                        os.path.join(args.workdir,
                                                     "partition"),
                                        "--backbone", "IR_50",
                                        "--batch_size", "8",
                                        "--groups", "Smoke"]))
    results.append(("train_stage2", [py, "tools/train_stage2.py",
                                     "--source_root", os.path.join(
                                         train_root, "id0"),
                                     "--val_root", os.path.join(
                                         train_root, "id1"),
                                     "--val_interval", "2",
                                     "--val_max_batches", "1",
                                     "--exp_dir", os.path.join(
                                         args.workdir, "stage2"),
                                     "--output_size", "32",
                                     "--batch_size", "2",
                                     "--max_steps", "3",
                                     "--lpips_lambda", "0",
                                     "--image_interval", "1"]))
    results.append(("inference_iterative",
                    [py, "tools/inference_iterative.py",
                     "--checkpoint_path",
                     os.path.join(args.workdir, "stage2"),
                     "--data_path", os.path.join(train_root, "id2"),
                     "--exp_dir", os.path.join(args.workdir, "inv"),
                     "--n_iters_per_batch", "2",
                     "--test_batch_size", "2",
                     "--output_size", "32", "--save_latents"]))
    results.append(("train_stage1", [py, "tools/train_stage1.py",
                                     "--data_root", train_root,
                                     "--exp_dir", os.path.join(
                                         args.workdir, "stage1"),
                                     "--image_size", "32",
                                     "--batch_size", "4",
                                     "--max_steps", "3",
                                     "--fid_interval", "2",
                                     "--fid_n", "8"]))

    if args.only:
        results = [(n, c) for n, c in results if n in args.only]

    lines = [f"\n## TPU CLI smoke — {time.strftime('%Y-%m-%d %H:%M')}\n"]
    ok_all = True
    for name, cmd in results:
        print(f"[smoke] {name}: {' '.join(cmd)}", flush=True)
        for attempt in range(1 + max(0, args.retries)):
            try:
                rc, dt, tail = run(cmd, args.timeout, env=env)
            except subprocess.TimeoutExpired:
                rc, dt, tail = -1, args.timeout, "(timed out)"
            if rc == 0:
                break
            print(f"[smoke] {name}: rc={rc} ({dt:.0f}s), attempt "
                  f"{attempt + 1}", flush=True)
        ok = rc == 0
        ok_all &= ok
        print(f"[smoke] {name}: rc={rc} ({dt:.0f}s)", flush=True)
        lines.append(f"### `{ ' '.join(cmd[1:]) }` (platform="
                     f"{args.platform})\n")
        lines.append(f"rc={rc}, {dt:.0f}s. Output tail:\n")
        lines.append("```\n" + tail.strip()[-800:] + "\n```\n")

    header = ("# VERIFIED — real-backend CLI smoke runs\n"
              if not os.path.exists(args.report) else "")
    with open(args.report, "a") as f:
        if header:
            f.write(header)
        f.write("\n".join(lines))
    print(f"[smoke] {'OK' if ok_all else 'FAILED'}; report -> "
          f"{args.report}")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
