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
import dataclasses
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
    """train.py:138-176 BACKBONE_DICT: ResNet_50/101/152, IR_*/IR_SE_*,
    plus pSp (the paper path) and MobileFaceNet."""
    from stylegan_for_facerec_tpu.models import (irse, mobilefacenet, psp,
                                                 resnet)
    name = opts.backbone
    if name == "pSp":
        return psp.PSpFaceRec(size=opts.input_size[0],
                              emb_size=opts.emb_size,
                              block_dropout=opts.dropout or None)
    if name == "MobileFaceNet":
        return mobilefacenet.MobileFaceNet(embedding_size=opts.emb_size)
    for mod in (irse, resnet):
        factory = getattr(mod, name, None)
        if factory is not None:
            return factory(opts.input_size[0], emb_size=opts.emb_size)
    raise SystemExit(f"unknown backbone {name}")


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
    ap.add_argument("--packed_dir", default=None,
                    help="pre-decoded uint8 shard directory made by "
                    "tools/pack_train.py; skips JPEG decode entirely")
    ap.add_argument("--no_prefetch", action="store_true",
                    help="disable the host->device double-buffering")
    ap.add_argument("--fast_decode", action="store_true",
                    help="native loader decodes large JPEGs at the "
                    "coarsest 1/2^k DCT scale covering the crop size "
                    "(libjpeg scale_denom); pixels differ slightly from "
                    "the full-res parity path")
    args = ap.parse_args()

    from stylegan_for_facerec_tpu.data import (
        FacesDataset, PackedLoader, PackedTrainDataset,
        device_prefetch, is_packed_dir)
    from stylegan_for_facerec_tpu.data.native_loader import make_loader
    from stylegan_for_facerec_tpu.eval import perform_val
    from stylegan_for_facerec_tpu.parallel import make_mesh
    from stylegan_for_facerec_tpu.parallel.mesh import (
        initialize_distributed_from_env)
    from stylegan_for_facerec_tpu.train import Stage3Config, Stage3Trainer
    from stylegan_for_facerec_tpu.utils.checkpoint import CheckpointManager

    opts = load_options(args.config)

    # multi-host pod slice: SGFR_COORDINATOR/.._NUM_PROCESSES/.._PROCESS_ID
    # (or a TPU pod runtime that auto-detects) joins this process into a
    # global mesh; each process then loads only its slice of every batch
    multiprocess = initialize_distributed_from_env()
    if multiprocess:
        print(f"[dist] process {jax.process_index()}/{jax.process_count()}"
              f" ({jax.local_device_count()} local of "
              f"{len(jax.devices())} global devices)")

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev // args.mesh_model_axis,
                     model=args.mesh_model_axis) if n_dev > 1 else None
    if mesh is not None:
        data_axis = mesh.shape["data"]
        if opts.batch_size % data_axis:
            # SPMD batch sharding needs divisibility (torch DataParallel
            # tolerated uneven splits; the reference default 100 is not
            # divisible by an 8-device axis). Round DOWN so memory never
            # exceeds the requested budget.
            new_bs = max(data_axis, opts.batch_size // data_axis
                         * data_axis)
            print(f"[mesh] batch_size {opts.batch_size} is not divisible "
                  f"by the {data_axis}-device data axis; using {new_bs}")
            opts = dataclasses.replace(opts, batch_size=new_bs)

    train_root = os.path.join(opts.data_root, opts.train_subdir)
    packed_dir = args.packed_dir
    if packed_dir is None and is_packed_dir(train_root):
        packed_dir = train_root
    if packed_dir is not None:
        if args.randaugment > 0:
            raise SystemExit("--randaugment needs the decode-path loader; "
                             "it cannot run on packed uint8 shards")
        ds = PackedTrainDataset(packed_dir)
        if ds.image_size < opts.input_size[0]:
            raise SystemExit(
                f"packed shards are {ds.image_size}px but INPUT_SIZE is "
                f"{opts.input_size[0]} — repack with tools/pack_train.py "
                f"--image_size >= {round(128 * opts.input_size[0] / 112)}")
        print(f"[data] packed: {len(ds)} images, {ds.n_identities} "
              f"identities from {packed_dir}")
        loader = PackedLoader(ds, opts.batch_size,
                              drop_last=(opts.drop_last or multiprocess),
                              process_id=jax.process_index(),
                              num_processes=jax.process_count())
    else:
        if multiprocess:
            raise SystemExit(
                "multi-process training feeds through packed shards "
                "(tools/pack_train.py + --packed_dir); the per-image "
                "decode loader has no cross-process batch contract")
        transform = None
        if args.randaugment > 0:
            from stylegan_for_facerec_tpu.data.randaugment import RandAugment
            transform = RandAugment(num_ops=args.randaugment)
            print(f"[data] RandAugment({args.randaugment} ops) enabled "
                  "(python loader)")
        # the reference scales the pre-crop resize with the input size —
        # Resize(int(128 * INPUT_SIZE[0] / 112)), train.py:109-117; a
        # fixed 128 would make random_crop degenerate for INPUT_SIZE > 128
        # (ADVICE r3 #1)
        ds_size = max(opts.input_size[0],
                      round(128 * opts.input_size[0] / 112))
        ds = FacesDataset(train_root, transform=transform,
                          image_size=ds_size)
        print(f"[data] {len(ds)} images, {ds.n_identities} identities "
              f"(resize {ds_size} -> crop {opts.input_size[0]})")
        loader = make_loader(ds, opts.batch_size,
                             num_workers=opts.num_workers,
                             drop_last=opts.drop_last,
                             fast_decode=args.fast_decode)
    if len(ds) == 0 or ds.n_identities == 0:
        raise SystemExit(f"no training images found under {train_root} "
                         "(check data_root/train_subdir)")
    steps_per_epoch = len(loader)
    if steps_per_epoch == 0:
        raise SystemExit(f"dataset ({len(ds)} images) smaller than one "
                         f"batch ({opts.batch_size}) with drop_last")

    backbone = build_backbone(opts, ds.n_identities)
    cfg = Stage3Config(
        emb_size=opts.emb_size, num_classes=ds.n_identities,
        head=opts.head, loss=("Focal" if opts.loss == "Focal" else "CE"),
        arcface_s=opts.arcface_s, margin=opts.margin, lr=opts.lr,
        momentum=opts.momentum, weight_decay=opts.weight_decay,
        batch_size=opts.batch_size, num_epochs=opts.num_epochs,
        stages=tuple(opts.stages),
        warmup_batches=opts.warmup_epochs * steps_per_epoch,
        freeze_backbone_epochs=opts.freeze_backbone_epochs,
        augment_crop=opts.input_size[0])
    trainer = Stage3Trainer(backbone, cfg, mesh=mesh,
                            steps_per_epoch=steps_per_epoch)
    params, state, opt_state = trainer.init(jax.random.key(0))

    # stage-2 encoder init (restyle_psp.py:419-437). Two handoff formats:
    # a torch .pt from the reference stack, or a run/checkpoint DIRECTORY
    # from tools/train_stage2.py (same encoder.{input_layer,body} tree).
    avg_image_path = opts.avg_image
    if opts.encoder_checkpoint and os.path.isdir(opts.encoder_checkpoint):
        from stylegan_for_facerec_tpu.utils.checkpoint import (
            load_checkpoint as _load_native)
        ckpt = _load_native(opts.encoder_checkpoint)
        enc = ckpt["params"]["encoder"]
        enc_state = ckpt.get("state", {}).get("encoder", {})
        for k in ("input_layer", "body"):
            want = jax.tree_util.tree_structure(
                params["backbone"]["encoder"][k])
            got = jax.tree_util.tree_structure(enc[k])
            if want != got:
                raise SystemExit(
                    f"stage-2 encoder.{k} tree does not match the "
                    f"stage-3 backbone (different num_layers/mode?)")
            params["backbone"]["encoder"][k] = enc[k]
            if k in enc_state:
                state["backbone"]["encoder"][k] = enc_state[k]
        print("[init] loaded stage-2 encoder weights (native run dir)")
        if not avg_image_path:
            cand = os.path.join(opts.encoder_checkpoint, "avg_image.npy")
            if os.path.exists(cand):
                avg_image_path = cand
    elif opts.encoder_checkpoint:
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
    if avg_image_path and hasattr(backbone, "use_avg_image"):
        if avg_image_path.endswith(".npy"):
            # stage-2 export (tools/train_stage2.py): float32 [-1,1] HWC
            state["backbone"]["avg_image"] = jnp.asarray(
                np.load(avg_image_path), jnp.float32)
        else:
            from PIL import Image
            img = np.asarray(Image.open(avg_image_path).convert("RGB"),
                             np.float32) / 255.0
            state["backbone"]["avg_image"] = jnp.asarray((img - 0.5) / 0.5)
        print(f"[init] loaded avg image from {avg_image_path}")

    # multi-process trees hold non-fully-addressable jax.Arrays: the npz
    # path (np.asarray per leaf) cannot gather them; orbax writes each
    # host's shards in place
    mgr = CheckpointManager(os.path.join(opts.model_root, opts.name),
                            backend="orbax" if multiprocess else "npz")
    from stylegan_for_facerec_tpu.utils.logging import MetricLogger
    logger = MetricLogger(
        log_dir=os.path.join(opts.model_root, opts.name, "logs"))
    start_epoch = opts.start_epoch
    resume_step = None  # mid-epoch step to continue from (preempted run)
    if args.resume:
        from stylegan_for_facerec_tpu.utils.checkpoint import (
            load_checkpoint, load_metadata)
        latest = mgr.latest()
        if latest:
            tree = load_checkpoint(latest, like={
                "params": params, "state": state, "opt_state": opt_state})
            params, state, opt_state = (tree["params"], tree["state"],
                                        tree["opt_state"])
            meta = load_metadata(latest)
            if meta.get("preempted"):
                # emergency mid-epoch save (SIGTERM/SIGINT): continue the
                # same epoch from the saved global step, skipping the
                # already-consumed batches
                start_epoch = meta.get("epoch", 0)
                resume_step = meta.get("step")
                # replay the SAME shuffle permutation the preempted epoch
                # used (loaders derive it from seed + _epoch), so the skip
                # below drops exactly the consumed batches — without this
                # the fresh loader re-seeds and epoch sample coverage is
                # silently uneven (ADVICE r3 #2)
                saved_perm = meta.get("loader_epoch")
                if saved_perm is not None and hasattr(loader, "_epoch"):
                    if meta.get("loader_seed") == getattr(
                            loader, "seed", None):
                        loader._epoch = saved_perm
                        print(f"[resume] replaying loader permutation "
                              f"{saved_perm}")
                    else:
                        print("[resume] WARNING: loader seed changed "
                              "since the preempted run; epoch sample "
                              "coverage will be uneven")
                print(f"[resume] preempted run {latest}: continuing epoch "
                      f"{start_epoch} from step {resume_step}")
            else:
                start_epoch = meta.get("epoch", -1) + 1
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

    step = resume_step if resume_step is not None \
        else start_epoch * steps_per_epoch
    key = jax.random.key(1)
    # Preemption safety: SIGTERM/SIGINT -> finish the in-flight step,
    # write an emergency checkpoint tagged mid-epoch, exit 0
    # (utils/preempt.py).
    from stylegan_for_facerec_tpu.utils.preempt import (
        install_preemption_handler)
    stop = install_preemption_handler()
    from stylegan_for_facerec_tpu.utils.logging import AverageMeter
    for epoch in range(start_epoch, opts.num_epochs):
        # reference freezes while epoch <= FREEZE_BACKBONE_EPOCHS
        # (train.py:263-274) with 1-based epochs; our epochs are 0-based so
        # "< N" trains the body one epoch early — match the recipe exactly
        frozen = (opts.freeze_backbone_epochs > 0
                  and epoch <= opts.freeze_backbone_epochs)
        mask = trainer.freeze_mask(params, frozen=frozen)
        t0 = time.time()
        # epoch AverageMeter aggregates, matching train.py:276-279,347-355
        losses, top1, top5 = AverageMeter(), AverageMeter(), AverageMeter()
        # permutation id of THIS epoch's shuffle (loaders use
        # seed + _epoch then increment) — recorded in the emergency
        # checkpoint so a preempted epoch can be replayed exactly
        loader_perm = getattr(loader, "_epoch", None)
        batch_iter = iter(loader)
        if resume_step is not None and epoch == start_epoch:
            # skip the batches the preempted run already consumed (order
            # is the loader's; we continue the step count, not the exact
            # sample sequence)
            for _ in range(resume_step - start_epoch * steps_per_epoch):
                next(batch_iter, None)
        if not args.no_prefetch:
            # ship batch k+1 host->device while the device runs batch k
            from stylegan_for_facerec_tpu.parallel import (
                mesh as mesh_lib)
            shardings = None
            if mesh is not None:
                bs = mesh_lib.batch_sharding(mesh)
                shardings = (bs, bs)
            batch_iter = device_prefetch(batch_iter, sharding=shardings)
        # metric reads lag one step so float() never stalls the device:
        # by the time we read step k's scalars, step k+1 is dispatched
        pending = None  # (step, metrics) of the previously dispatched step

        def drain(p):
            st, m = p
            vals = {k: float(v) for k, v in m.items()}
            losses.update(vals["loss"])
            top1.update(vals["top1"])
            top5.update(vals["top5"])
            # train_loss every 10 batches (train.py:329-331)
            if st % 10 == 0:
                logger.log(st, {"train_loss": vals["loss"],
                                "train_top1": vals["top1"],
                                "train_top5": vals["top5"],
                                "lr": vals["lr"], "epoch": epoch})

        for images, labels in batch_iter:
            # crop/flip happen inside the jitted step (cfg.augment_crop):
            # one dispatch per batch
            key, k_step = jax.random.split(key)
            params, state, opt_state, metrics = trainer.train_step(
                params, state, opt_state, jnp.asarray(images),
                jnp.asarray(labels), k_step, jnp.asarray(step), mask)
            if pending is not None:
                drain(pending)
            pending = (step, metrics)
            step += 1
            if args.max_steps and step >= args.max_steps:
                break
            if stop.is_set():
                break
        if pending is not None:
            drain(pending)
        if stop.is_set():
            mgr.save(step, {"params": params, "state": state,
                            "opt_state": opt_state},
                     metadata={"epoch": epoch, "step": step,
                               "preempted": True,
                               "loader_epoch": loader_perm,
                               "loader_seed": getattr(loader, "seed",
                                                      None)})
            print(f"[preempt] emergency checkpoint at step {step} "
                  f"(epoch {epoch}); resume with --resume", flush=True)
            return
        dt = time.time() - t0
        # epoch aggregates (train.py:347-355 wandb epoch block)
        logger.log(step, {"train_loss_ep": losses.avg,
                          "train_acc_ep": top1.avg,
                          "train_acc_top5_ep": top5.avg,
                          "epoch": epoch, "epoch_seconds": dt,
                          "imgs_per_sec": losses.count
                          * opts.batch_size / max(dt, 1e-9)})

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
