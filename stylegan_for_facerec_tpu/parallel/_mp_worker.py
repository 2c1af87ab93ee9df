"""Multi-process SPMD worker: a tiny stage-3 training run over a GLOBAL
mesh spanning several processes.

This is the executable proof of the pod-slice story (the last leap past
the single-process virtual mesh): N processes each see only their local
devices, ``jax.distributed.initialize`` joins them into one runtime,
every process loads only its ``PackedLoader`` slice of each global batch,
``device_prefetch`` assembles the slices into global jax.Arrays via
``make_array_from_process_local_data``, and the jitted SPMD train step —
batch sharded over 'data', ArcFace head class-sharded over 'model' — runs
identically to a single process that sees all devices.

The reference has no analog (its parallelism is single-process
``nn.DataParallel``, ``/root/reference/train.py:219-222``); the
multi-host input path replaces its DataLoader scatter.

Run (CPU testing; each process gets its local virtual devices via
XLA_FLAGS=--xla_force_host_platform_device_count=K):

  python -m stylegan_for_facerec_tpu.parallel._mp_worker \
      --nproc 2 --pid 0 --port 12701 &
  python -m stylegan_for_facerec_tpu.parallel._mp_worker \
      --nproc 2 --pid 1 --port 12701

With --nproc 1 the same script runs single-process over all local
devices — the numerics reference the multi-process run must match.

Prints one ``MPSTEP <step> <loss> <top1>`` line per step and a final
``MP_WORKER_OK``. Used by tests/test_multiprocess_mesh.py and the
driver's ``__graft_entry__.dryrun_multichip`` 'mp3' stage.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile


def _build(args):
    import numpy as np
    import jax

    from .. import nn
    from ..data import PackedTrainDataset, write_packed
    from ..models import irse
    from ..train import Stage3Config, Stage3Trainer
    from . import mesh as mesh_lib

    # deterministic tiny packed dataset: every process generates the
    # IDENTICAL data from a fixed seed, so no cross-process file sharing
    # is needed
    root = os.path.join(tempfile.gettempdir(),
                        f"sgfr_mp_packed_p{jax.process_index()}")
    if not os.path.exists(os.path.join(root, "packed_meta.json")):
        rng = np.random.RandomState(0)
        write_packed(root,
                     rng.randint(0, 256, (64, 32, 32, 3), dtype=np.uint8),
                     rng.randint(0, 64, 64).astype(np.int32),
                     id_list=[str(i) for i in range(64)], shard_size=32)
    ds = PackedTrainDataset(root)

    # one IR bottleneck per stage at 32px — same tiny backbone shape the
    # driver dryrun uses
    class TinyBackbone(irse.Backbone):
        def _children(self):
            ch = super()._children()
            ch["body"] = nn.Sequential(
                *[irse.BottleneckIR(i, d, s, se=True) for i, d, s in
                  [(64, 64, 2), (64, 128, 2), (128, 256, 2),
                   (256, 512, 2)]])
            return ch

    ndev = len(jax.devices())
    model_axis = 2 if ndev % 2 == 0 and ndev >= 4 else 1
    mesh = mesh_lib.make_mesh(data=ndev // model_axis, model=model_axis)
    backbone = TinyBackbone(input_size=32, num_layers=50, mode="ir_se",
                            emb_size=64)
    cfg = Stage3Config(emb_size=64, num_classes=64,
                       batch_size=args.batch, freeze_backbone_epochs=0,
                       compute_dtype="float32")
    trainer = Stage3Trainer(backbone, cfg, mesh=mesh, steps_per_epoch=4)
    return ds, mesh, trainer, mesh_lib


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--port", type=int, default=12701)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/jax_cache_cpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.nproc > 1:
        from . import mesh as _m
        _m.initialize_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nproc, process_id=args.pid)

    import numpy as np
    import jax.numpy as jnp

    ds, mesh, trainer, mesh_lib = _build(args)
    print(f"[mp{args.pid}] {jax.process_count()} processes, "
          f"{jax.local_device_count()} local / {len(jax.devices())} "
          f"global devices, mesh "
          f"{dict(zip(mesh.axis_names, mesh.devices.shape))}", flush=True)

    from ..data import PackedLoader, device_prefetch
    with mesh:
        params, state, opt = trainer.init(jax.random.key(0))
        loader = PackedLoader(ds, args.batch, seed=1, drop_last=True,
                              process_id=jax.process_index(),
                              num_processes=jax.process_count())
        bsh = mesh_lib.batch_sharding(mesh)
        mask = trainer.freeze_mask(params, frozen=False)
        step = 0
        for images, labels in device_prefetch(iter(loader),
                                              sharding=(bsh, bsh)):
            params, state, opt, metrics = trainer.train_step(
                params, state, opt, images, labels,
                jax.random.key(100 + step), jnp.asarray(step, jnp.int32),
                mask)
            loss = float(np.asarray(metrics["loss"]))
            top1 = float(np.asarray(metrics["top1"]))
            assert np.isfinite(loss), f"non-finite mp loss {loss}"
            print(f"MPSTEP {step} {loss:.6f} {top1:.4f}", flush=True)
            step += 1
            if step >= args.steps:
                break
    print("MP_WORKER_OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
