#!/usr/bin/env python
"""Stage-3 face-recognition training CLI.

Equivalent of ``python train.py --config configs/config_BUPT_IR_50_*.py``
(``/root/reference/train.py:21-421``): dataset scan, backbone (pSp encoder
or plain IR-*), margin head, SGD with warmup + staged decay,
frozen-backbone epochs, per-epoch RFW eval + checkpointing.

Accepts legacy reference config modules (--config path/to/config.py) or
JSON/YAML Stage3Options.
"""

import argparse
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def load_options(path):
    from stylegan_for_facerec_tpu.utils.config import (
        Stage3Options, from_reference_stage3, load_config)
    if path.endswith(".py"):
        spec = importlib.util.spec_from_file_location("usercfg", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return from_reference_stage3(mod.configurations)
    return load_config(Stage3Options, path)


def build_backbone(opts, num_classes):
    from stylegan_for_facerec_tpu.models import irse, psp
    name = opts.backbone
    if name == "pSp":
        return psp.PSpFaceRec(size=opts.input_size[0],
                              emb_size=opts.emb_size,
                              block_dropout=opts.dropout or None)
    factory = getattr(irse, name, None)
    if factory is None:
        raise SystemExit(f"unknown backbone {name}")
    return factory(opts.input_size[0], emb_size=opts.emb_size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max_steps", type=int, default=None,
                    help="debug cap on total steps")
    ap.add_argument("--mesh_model_axis", type=int, default=1)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in model_root")
    ap.add_argument("--randaugment", type=int, default=0, metavar="N_OPS",
                    help="enable host-side RandAugment with N ops per "
                    "image (the reference ships data_processing/"
                    "randaugment.py unwired; this wires it in)")
    args = ap.parse_args()

    from stylegan_for_facerec_tpu.data import FacesDataset, device_augment
    from stylegan_for_facerec_tpu.data.native_loader import make_loader
    from stylegan_for_facerec_tpu.eval import perform_val
    from stylegan_for_facerec_tpu.parallel import make_mesh
    from stylegan_for_facerec_tpu.train import Stage3Config, Stage3Trainer
    from stylegan_for_facerec_tpu.utils.checkpoint import CheckpointManager

    opts = load_options(args.config)
    train_root = os.path.join(opts.data_root, opts.train_subdir)
    transform = None
    if args.randaugment > 0:
        from stylegan_for_facerec_tpu.data.randaugment import RandAugment
        transform = RandAugment(num_ops=args.randaugment)
        print(f"[data] RandAugment({args.randaugment} ops) enabled "
              "(python loader)")
    ds = FacesDataset(train_root, transform=transform)
    print(f"[data] {len(ds)} images, {ds.n_identities} identities")
    loader = make_loader(ds, opts.batch_size,
                         num_workers=opts.num_workers,
                         drop_last=opts.drop_last)
    steps_per_epoch = len(loader)

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev // args.mesh_model_axis,
                     model=args.mesh_model_axis) if n_dev > 1 else None

    backbone = build_backbone(opts, ds.n_identities)
    cfg = Stage3Config(
        emb_size=opts.emb_size, num_classes=ds.n_identities,
        head=opts.head, loss=("Focal" if opts.loss == "Focal" else "CE"),
        arcface_s=opts.arcface_s, margin=opts.margin, lr=opts.lr,
        momentum=opts.momentum, weight_decay=opts.weight_decay,
        batch_size=opts.batch_size, num_epochs=opts.num_epochs,
        stages=tuple(opts.stages),
        warmup_batches=opts.warmup_epochs * steps_per_epoch,
        freeze_backbone_epochs=opts.freeze_backbone_epochs)
    trainer = Stage3Trainer(backbone, cfg, mesh=mesh,
                            steps_per_epoch=steps_per_epoch)
    params, state, opt_state = trainer.init(jax.random.key(0))

    # stage-2 encoder init (restyle_psp.py:419-437)
    if opts.encoder_checkpoint:
        from stylegan_for_facerec_tpu.utils.torch_convert import (
            from_torch, load_torch_checkpoint)
        ckpt = load_torch_checkpoint(opts.encoder_checkpoint)
        sd = ckpt.get("state_dict", ckpt)
        enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
                  if k.startswith("encoder.")}
        enc_def = backbone._children()["encoder"]
        p_enc, s_enc = from_torch(enc_def, enc_sd, strict=False)
        # load input_layer + body strictly, keep fresh output head
        params["backbone"]["encoder"]["input_layer"] = \
            p_enc["input_layer"]
        params["backbone"]["encoder"]["body"] = p_enc["body"]
        for k in ("input_layer", "body"):
            if k in s_enc:
                state["backbone"]["encoder"][k] = s_enc[k]
        print("[init] loaded stage-2 encoder weights")
    if opts.avg_image and hasattr(backbone, "use_avg_image"):
        from PIL import Image
        img = np.asarray(Image.open(opts.avg_image).convert("RGB"),
                         np.float32) / 255.0
        state["backbone"]["avg_image"] = jnp.asarray((img - 0.5) / 0.5)
        print("[init] loaded avg image")

    mgr = CheckpointManager(os.path.join(opts.model_root, opts.name))
    from stylegan_for_facerec_tpu.utils.logging import MetricLogger
    logger = MetricLogger(
        log_dir=os.path.join(opts.model_root, opts.name, "logs"))
    start_epoch = opts.start_epoch
    if args.resume:
        from stylegan_for_facerec_tpu.utils.checkpoint import (
            load_checkpoint, load_metadata)
        latest = mgr.latest()
        if latest:
            tree = load_checkpoint(latest, like={
                "params": params, "state": state, "opt_state": opt_state})
            params, state, opt_state = (tree["params"], tree["state"],
                                        tree["opt_state"])
            start_epoch = load_metadata(latest).get("epoch", -1) + 1
            print(f"[resume] from {latest}, epoch {start_epoch}")
    # per-benchmark packed pairs named by opts.eval_benchmarks
    # (train.py:134 get_val_data equivalent); missing files are skipped
    from stylegan_for_facerec_tpu.eval import load_val_pair
    val_data = {}
    for bench_name in opts.eval_benchmarks:
        try:
            val_data[bench_name] = load_val_pair(
                os.path.join(opts.data_root, bench_name))
        except FileNotFoundError:
            print(f"[eval] {bench_name} packed data not found; skipping")

    step = start_epoch * steps_per_epoch
    key = jax.random.key(1)
    for epoch in range(start_epoch, opts.num_epochs):
        # reference freezes while epoch <= FREEZE_BACKBONE_EPOCHS
        # (train.py:263-274) with 1-based epochs; our epochs are 0-based so
        # "< N" trains the body one epoch early — match the recipe exactly
        frozen = (opts.freeze_backbone_epochs > 0
                  and epoch <= opts.freeze_backbone_epochs)
        mask = trainer.freeze_mask(params, frozen=frozen)
        t0 = time.time()
        for images, labels in loader:
            key, k_aug, k_step = jax.random.split(key, 3)
            images = device_augment(k_aug, jnp.asarray(images),
                                    crop=opts.input_size[0])
            params, state, opt_state, metrics = trainer.train_step(
                params, state, opt_state, images, jnp.asarray(labels),
                k_step, jnp.asarray(step), mask)
            if step % 10 == 0:
                print(f"epoch {epoch} step {step} "
                      f"loss {float(metrics['loss']):.4f} "
                      f"top1 {float(metrics['top1']):.3f} "
                      f"lr {float(metrics['lr']):.5f}")
            step += 1
            if args.max_steps and step >= args.max_steps:
                break
        print(f"[epoch {epoch}] {time.time() - t0:.1f}s")

        if val_data:
            for name, (carray, issame) in val_data.items():
                acc, thr, roc = perform_val(
                    backbone, params["backbone"], state["backbone"],
                    carray, issame)
                logger.log_benchmark(step, name, acc, thr, epoch=epoch,
                                     roc=roc)
        mgr.save(step, {"params": params, "state": state,
                        "opt_state": opt_state},
                 metadata={"epoch": epoch})
        if args.max_steps and step >= args.max_steps:
            break


if __name__ == "__main__":
    main()
