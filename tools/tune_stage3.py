#!/usr/bin/env python
"""Stage-3 ArcFace train-step throughput/MFU sweep (VERDICT r1 #3: close
the gap to the >=40% MFU BASELINE bar).

Sweeps (batch_size, remat, compute_dtype) on the current backend with the
scan-delta timing methodology (see bench.py), reporting imgs/sec and MFU
from XLA's cost model. Writes one JSON line per config and a final
markdown table.

Usage:
  python tools/tune_stage3.py --batches 128 256 512 --out /tmp/tune.md
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.makedirs("/tmp/jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("SGFR_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SGFR_PLATFORM"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def scan_time(make_step, carry, short=1, long=4, consts=None):
    # consts ride as jit ARGUMENTS: closed-over arrays are embedded as
    # literals and the axon remote-compile helper 413s past ~100MB
    def runner(n):
        @jax.jit
        def run(c0, cs):
            def body(c, _):
                return make_step(c, cs), ()
            c, _ = jax.lax.scan(body, c0, None, length=n)
            leaf = jax.tree_util.tree_leaves(c)[0]
            return jnp.float32(jnp.real(leaf.reshape(-1)[0]))
        t_c = time.perf_counter()
        np.asarray(run(carry, consts))
        print(f"    compile+run(n={n}): {time.perf_counter() - t_c:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        np.asarray(run(carry, consts))
        return time.perf_counter() - t0
    ts, tl = runner(short), runner(long)
    return max((tl - ts) / (long - short), 1e-9)


def build_backbone(name):
    from stylegan_for_facerec_tpu import nn
    from stylegan_for_facerec_tpu.models import irse
    if name == "tiny":  # CPU sanity of the harness itself
        class Tiny(irse.Backbone):
            def _children(self):
                ch = super()._children()
                ch["body"] = nn.Sequential(
                    *[irse.BottleneckIR(i, d, s, se=True) for i, d, s in
                      [(64, 64, 2), (64, 128, 2), (128, 256, 2),
                       (256, 512, 2)]])
                return ch
        return Tiny(input_size=32, num_layers=50, mode="ir_se"), 32
    return getattr(irse, name)(112), 112


def measure(bs, remat, dtype, num_classes, peak, model="IR_SE_50"):
    from stylegan_for_facerec_tpu.train import Stage3Config, Stage3Trainer

    backbone, input_size = build_backbone(model)
    cfg = Stage3Config(num_classes=num_classes, batch_size=bs, remat=remat,
                       compute_dtype=dtype, freeze_backbone_epochs=0)
    trainer = Stage3Trainer(backbone, cfg, steps_per_epoch=1000)
    params, state, opt_state = trainer.init(jax.random.key(0))
    images = jnp.asarray(
        np.random.RandomState(0).randn(bs, input_size, input_size, 3),
        jnp.float32)
    labels = jnp.asarray(
        np.random.RandomState(1).randint(0, num_classes, bs), jnp.int32)
    rng = jax.random.key(2)
    step0 = jnp.zeros((), jnp.int32)

    def it(carry, cs):
        p, s, o = carry
        imgs, lbls = cs
        p, s, o, _ = trainer._train_step(p, s, o, imgs, lbls, rng,
                                         step0, None)
        return (p, s, o)

    dt = scan_time(it, (params, state, opt_state),
                   consts=(images, labels))
    flops = None
    try:
        lowered = jax.jit(trainer._train_step).lower(
            params, state, opt_state, images, labels, rng, step0, None)
        try:
            cost = lowered.cost_analysis()   # no second compile
        except Exception:  # noqa: BLE001
            cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001
        print(f"    cost_analysis failed: {e}", flush=True)
    if flops is None and model != "tiny":
        # axon TPU backend lacks cost analysis — lower on a CPU child
        import bench as bench_mod
        os.environ["BENCH_TRAIN_CLASSES"] = str(num_classes)
        os.environ["BENCH_TRAIN_MODEL"] = model
        os.environ["BENCH_TRAIN_REMAT"] = "1" if remat else "0"
        flops = bench_mod._train_step_flops_cpu_child(bs)
        print(f"    flops via CPU child: {flops}", flush=True)
    row = {"batch": bs, "remat": remat, "dtype": dtype,
           "step_ms": round(dt * 1e3, 2), "imgs_per_sec": round(bs / dt, 1)}
    if flops:
        row["tflops_per_step"] = round(flops / 1e12, 3)
        row["mfu"] = round(flops / dt / peak, 4)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[128, 256])
    ap.add_argument("--remat", type=int, nargs="+", default=[0])
    ap.add_argument("--dtypes", nargs="+", default=["bfloat16"])
    ap.add_argument("--num_classes", type=int, default=28000)
    ap.add_argument("--peak", type=float, default=197e12,
                    help="chip peak FLOP/s (v5e bf16 ~197e12)")
    ap.add_argument("--model", default="IR_SE_50",
                    help="irse factory name, or 'tiny' for harness sanity")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)
    rows = []
    for dtype in args.dtypes:
        for remat in args.remat:
            for bs in args.batches:
                print(f"[tune] bs={bs} remat={bool(remat)} {dtype}",
                      flush=True)
                try:
                    row = measure(bs, bool(remat), dtype,
                                  args.num_classes, args.peak,
                                  model=args.model)
                except Exception as e:  # noqa: BLE001 — OOM etc.
                    row = {"batch": bs, "remat": bool(remat),
                           "dtype": dtype, "error": repr(e)[-200:]}
                print(json.dumps(row), flush=True)
                rows.append(row)

    if args.out:
        keys = ["batch", "remat", "dtype", "step_ms", "imgs_per_sec",
                "tflops_per_step", "mfu"]
        lines = ["| " + " | ".join(keys) + " |",
                 "|" + "---|" * len(keys)]
        for r in rows:
            lines.append("| " + " | ".join(str(r.get(k, "-"))
                                           for k in keys) + " |")
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"table -> {args.out}")


if __name__ == "__main__":
    main()
