#!/usr/bin/env python
"""Mint a stage-2-TRAINED reference checkpoint and hand it to the
reference's STAGE-3 pSp — the flagship path of the paper — so
``verify_parity.py`` can check the framework against trained stage-2
weights end-to-end (VERDICT r4 next #6).

Round 4 proved trained-weights parity for plain IR_50; what it did not
cover is the stage-2-initialized path: the 6-channel input layer, the
avg-image concat, and the encoder-subtree handoff
(``/root/reference/backbone/restyle_psp.py:419-437`` strict
``encoder.input_layer`` + ``encoder.body`` load) under TRAINED weights
and real BN statistics. This tool produces exactly that artifact using
the REFERENCE'S OWN torch modules at tiny scale:

 1. random-init ADA generator at 256² saved in the ADA-lightning ckpt
    format the stage-2 pSp loader expects (``{'state_dict': {'G.'+k}}``
    plus a (512,) ``latent_avg``, ``restyle-encoder/models/psp.py:67-77``
    and ``:124-129``);
 2. the stage-2 pSp (``BackboneEncoder`` ir-se-50, input_nc=6,
    n_styles 16) trained with the coach's iterative-refinement
    semantics (``coach_restyle_psp.py:138-180``): avg-image concat on
    iter 0, detached y_hat/latent carry after, per-iteration backward,
    ONE Ranger step per batch, ``net.train()`` so encoder BN buffers
    move. Losses: l2 + w_norm (the LPIPS/ID towers need weight
    downloads — offline — and the README stage-2 recipe itself runs
    ``id_lambda=0 w_norm_lambda=0``, so l2 carries training);
    avg_image synthesized from latent_avg then BUPT-cropped
    [35:223, 30:218] and bilinear-resized to 112
    (``coach_restyle_psp.py:80-82``);
 3. the stage-2 checkpoint handed to the reference's stage-3 pSp
    (strict subtree load above); the full stage-3 ``state_dict`` (body
    trained at stage 2 + the fresh facerec output layer) saved so
    ``verify_parity.py --backbone pSp`` runs BOTH stacks from identical
    weights;
 4. held-out synthetic identity pairs packed for the protocol sweep.

Then:

  python tools/verify_parity.py \
      --torch_checkpoint <out>/psp_stage2init.pth --backbone pSp \
      --avg_image <out>/avg_image.npy --data_root <out> \
      --benchmarks synth

Training data: the reference's own ``dummy-test-data`` 112² faces
(``README.md:139`` ships them as the stand-in stage-2 set).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def load_dummy_faces(root):
    from PIL import Image
    paths = sorted(glob.glob(os.path.join(root, "*.jpg")))
    imgs = [np.asarray(Image.open(p).convert("RGB"), np.float32)
            / 127.5 - 1.0 for p in paths]
    return np.stack(imgs)           # (N, 112, 112, 3) in [-1, 1]


def make_generator_ckpt(path, seed):
    """Random-init ADA generator in the ADA-lightning checkpoint format
    (``models/psp.py:74-77`` expects 'G.'-prefixed keys under
    'state_dict'; ``:124-129`` reads 'latent_avg' and repeats it to
    n_styles)."""
    import torch
    from reference_oracle import ref_import_restyle

    gen_mod = ref_import_restyle("models.stylegan2_ada.generator")
    torch.manual_seed(seed)
    G = gen_mod.Generator(z_dim=512, w_dim=512, w_num_layers=8,
                          img_resolution=256, img_channels=3)
    with torch.no_grad():
        z = torch.randn(512, 512)
        # mean_latent semantics (generator.py:43-49) without the
        # hardcoded cuda:0 device: w rows are identical per sample, so
        # the first row's mean is the (512,) latent_avg ADA-lightning
        # checkpoints carry
        w = G.mapping(z, truncation_psi=1, truncation_cutoff=None)
        latent_avg = w[:, 0, :].mean(0)
    sd = {"G." + k: v for k, v in G.state_dict().items()}
    torch.save({"state_dict": sd, "latent_avg": latent_avg}, path)
    return path


def train_stage2(args):
    """The coach's train loop semantics (coach_restyle_psp.py:138-180)
    on the reference's own stage-2 pSp."""
    import torch
    import torch.nn.functional as F
    from reference_oracle import ref_import_restyle

    psp_mod = ref_import_restyle("models.psp")
    ranger_mod = ref_import_restyle("training.ranger")
    w_norm_mod = ref_import_restyle("criteria.w_norm")

    gen_ckpt = make_generator_ckpt(
        os.path.join(args.out, "stylegan_ada_init.pt"), args.seed)

    class Opts:
        output_size = 256
        generator_ada = True
        encoder_type = "BackboneEncoder"
        checkpoint_path = None
        stylegan_weights = gen_ckpt
        input_nc = 6
        dataset_type = "afr_asian_faces"
        device = "cpu"

    torch.manual_seed(args.seed + 1)
    net = psp_mod.pSp(Opts())
    net.train()
    # decoder frozen, encoder trained (train_decoder=False default,
    # coach_restyle_psp.py:270-278)
    for p in net.decoder.parameters():
        p.requires_grad_(False)

    # avg image: synthesize from latent_avg, BUPT-crop, resize 112
    # (coach_restyle_psp.py:56-82)
    with torch.no_grad():
        avg = net(net.latent_avg.unsqueeze(0), input_code=True,
                  randomize_noise=False, average_code=True)[0]
        avg = avg[..., 35:35 + 188, 30:30 + 188]
        avg = F.interpolate(avg.unsqueeze(0), 112, mode="bilinear")[0]
    avg_image = avg.float().detach()

    w_norm_loss = w_norm_mod.WNormLoss(start_from_latent_avg=True)
    optimizer = ranger_mod.Ranger(
        [p for p in net.encoder.parameters() if p.requires_grad],
        lr=args.lr)

    faces = load_dummy_faces(args.data)
    rng = np.random.RandomState(args.seed + 2)
    t_faces = torch.tensor(faces.transpose(0, 3, 1, 2))

    for step in range(args.steps):
        idx = rng.randint(0, len(faces), size=args.batch_size)
        x = t_faces[idx].clone()
        y = x.clone()
        optimizer.zero_grad()
        y_hat, latent = None, None
        for it in range(args.n_iters_per_batch):
            if it == 0:
                cond = avg_image.unsqueeze(0).repeat(x.shape[0], 1, 1, 1)
                x_input = torch.cat([x, cond], dim=1)
                y_hat, latent = net.forward(x_input, latent=None,
                                            return_latents=True)
            else:
                y_hat_c = y_hat.clone().detach().requires_grad_(True)
                latent_c = latent.clone().detach().requires_grad_(True)
                x_input = torch.cat([x, y_hat_c], dim=1)
                y_hat, latent = net.forward(x_input, latent=latent_c,
                                            return_latents=True)
            y_hat = F.interpolate(y_hat, 112, mode="bilinear")
            loss = args.l2_lambda * F.mse_loss(y_hat, y)
            if args.w_norm_lambda > 0:
                loss = loss + args.w_norm_lambda * w_norm_loss(
                    latent, net.latent_avg)
            loss.backward()     # grads ACCUMULATE across iters
        optimizer.step()
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f}", flush=True)

    ckpt_path = os.path.join(args.out, "stage2_trained.pt")
    torch.save({"state_dict": net.state_dict(),
                "latent_avg": net.latent_avg}, ckpt_path)
    np.save(os.path.join(args.out, "avg_image.npy"),
            avg_image.numpy().transpose(1, 2, 0))
    # report that BN stats actually moved (the thing random-init golden
    # tests cannot exercise)
    bn_mean = torch.cat([m.running_mean.flatten().abs()
                         for m in net.encoder.modules()
                         if isinstance(m, torch.nn.BatchNorm2d)])
    print(f"stage-2 trained: encoder BN |mean| {float(bn_mean.mean()):.4f}",
          flush=True)
    return ckpt_path


def build_stage3(args, stage2_ckpt):
    """Reference stage-3 pSp initialized from the stage-2 checkpoint via
    its own strict subtree load (restyle_psp.py:419-437)."""
    import torch
    from reference_oracle import ref_import

    torch.manual_seed(args.seed + 3)
    rp = ref_import("backbone.restyle_psp")
    model = rp.pSp(size=112, encoder_type="BackboneEncoder",
                   checkpoint_path=stage2_ckpt, avg_image=None)
    out_path = os.path.join(args.out, "psp_stage2init.pth")
    torch.save({"state_dict": model.state_dict()}, out_path)
    print(f"stage-3 pSp (stage-2 init) saved: {out_path}", flush=True)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--data",
                    default="/root/reference/restyle-encoder/"
                            "dummy-test-data")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--n_iters_per_batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--l2_lambda", type=float, default=1.0)
    ap.add_argument("--w_norm_lambda", type=float, default=0.005)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n_ids", type=int, default=16,
                    help="synthetic identities for the eval pairs")
    ap.add_argument("--n_pairs", type=int, default=120)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    stage2_ckpt = train_stage2(args)
    build_stage3(args, stage2_ckpt)

    # held-out verification pairs in the packed npz format (round-4
    # pattern, tools/train_reference_baseline.py)
    from train_reference_baseline import (make_identity_images,
                                          write_pairs_npz)
    rng = np.random.RandomState(args.seed + 4)
    imgs, labels = make_identity_images(rng, args.n_ids, 6)
    write_pairs_npz(os.path.join(args.out, "synth.npz"), rng, imgs,
                    labels, args.n_ids, args.n_pairs, args.n_pairs)
    print("done; now run tools/verify_parity.py --backbone pSp "
          f"--torch_checkpoint {os.path.join(args.out, 'psp_stage2init.pth')} "
          f"--avg_image {os.path.join(args.out, 'avg_image.npy')} "
          f"--data_root {args.out} --benchmarks synth", flush=True)


if __name__ == "__main__":
    main()
