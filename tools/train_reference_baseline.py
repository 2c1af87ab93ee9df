#!/usr/bin/env python
"""Mint a TRAINED reference-stack checkpoint for the parity check.

The published pretrained checkpoints are offline-unreachable
(``/root/reference/README.md:208``), so the parity evidence otherwise
rests on random-init weights — which exercise neither trained weight
distributions nor non-trivial BatchNorm running statistics (VERDICT r3
next #2). This tool trains the REFERENCE'S OWN torch stack at tiny
scale using its own training-loop semantics:

  * ``backbone.model_irse`` Backbone (the real IR-50 at 112px),
  * ``head.metrics.ArcFace`` (device_id=None CPU path),
  * ``loss.focal.FocalLoss``,
  * SGD with the BN weight-decay split param groups
    (``/root/reference/train.py:189-196`` via
    ``util.utils.separate_irse_bn_paras``), ``model.train()`` so BN
    running buffers update every step,

on a deterministic synthetic-identity dataset (smooth per-identity
templates + per-image noise — learnable identity structure), then writes

  <out>/backbone_trained.pth      the backbone state_dict (the format
                                  the reference saves per epoch,
                                  train.py:412-421)
  <out>/synth.npz                 held-out verification pairs in the
                                  packed format of tools/pack_rfw.py

so the end-to-end claim becomes one command:

  python tools/verify_parity.py --torch_checkpoint <out>/backbone_trained.pth \
      --backbone IR_50 --data_root <out> --benchmarks synth
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def make_identity_images(rng, n_ids, n_per, size=112, grid=14,
                         noise=0.35):
    """(n_ids * n_per, size, size, 3) float32 in [-1, 1]: a smooth
    low-frequency per-identity template (bilinear-upsampled random grid)
    plus per-image gaussian noise — enough identity structure for a
    backbone to learn, enough noise that it has to."""
    from PIL import Image
    imgs = np.empty((n_ids * n_per, size, size, 3), np.float32)
    labels = np.empty((n_ids * n_per,), np.int64)
    for i in range(n_ids):
        t = rng.randn(grid, grid, 3).astype(np.float32)
        t8 = ((t - t.min()) / (np.ptp(t) + 1e-9) * 255).astype(np.uint8)
        tpl = np.asarray(Image.fromarray(t8).resize((size, size),
                                                    Image.BILINEAR),
                         np.float32) / 127.5 - 1.0
        for j in range(n_per):
            x = tpl + noise * rng.randn(size, size, 3).astype(np.float32)
            imgs[i * n_per + j] = np.clip(x, -1, 1)
            labels[i * n_per + j] = i
    return imgs, labels


def build_reference_stack(n_ids, emb_size, lr, momentum, weight_decay,
                          reference_root):
    import reference_oracle
    reference_oracle.install_dep_stubs()
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    import torch
    import torch.optim as optim
    import backbone.model_irse as m
    from head.metrics import ArcFace
    from loss.focal import FocalLoss
    from util.utils import separate_irse_bn_paras

    # the reference targets torch 1.6; its Flatten uses .view which
    # torch>=2 rejects on non-contiguous layouts (same shim as
    # tools/verify_parity.py)
    if hasattr(m, "Flatten"):
        m.Flatten.forward = lambda self, x: x.reshape(x.size(0), -1)
    torch.manual_seed(11)
    backbone = m.IR_50([112, 112])
    head = ArcFace(in_features=emb_size, out_features=n_ids,
                   device_id=None)
    loss_fn = FocalLoss()
    bn_only, wo_bn = separate_irse_bn_paras(backbone)
    _, head_wo_bn = separate_irse_bn_paras(head)
    opt = optim.SGD(
        [{"params": wo_bn + head_wo_bn, "weight_decay": weight_decay},
         {"params": bn_only}], lr=lr, momentum=momentum)
    return backbone, head, loss_fn, opt


def write_pairs_npz(path, rng, imgs, labels, n_ids, n_same, n_diff):
    """Held-out verification pairs, interleaved [a0,b0,a1,b1,...] with
    issame[k] for pair k — the layout evaluate()/perform_val consume
    (util/verification.py:37-64)."""
    by_id = [np.where(labels == i)[0] for i in range(n_ids)]
    pairs, issame = [], []
    for _ in range(n_same):
        i = rng.randint(n_ids)
        a, b = rng.choice(by_id[i], 2, replace=False)
        pairs += [a, b]
        issame.append(True)
    for _ in range(n_diff):
        i, j = rng.choice(n_ids, 2, replace=False)
        pairs += [rng.choice(by_id[i]), rng.choice(by_id[j])]
        issame.append(False)
    np.savez(path, images=imgs[np.asarray(pairs)],
             issame=np.asarray(issame, bool))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_ids", type=int, default=24)
    ap.add_argument("--n_per", type=int, default=20)
    ap.add_argument("--holdout_per", type=int, default=6,
                    help="per-identity images reserved for eval pairs")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--emb_size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reference_root", default="/root/reference")
    args = ap.parse_args()

    import torch
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    imgs, labels = make_identity_images(rng, args.n_ids, args.n_per)

    # split train / held-out-for-pairs per identity
    train_mask = np.ones(len(imgs), bool)
    for i in range(args.n_ids):
        idxs = np.where(labels == i)[0]
        train_mask[idxs[-args.holdout_per:]] = False
    write_pairs_npz(os.path.join(args.out, "synth.npz"),
                    np.random.RandomState(args.seed + 1),
                    imgs, np.where(train_mask, -1, labels), args.n_ids,
                    n_same=120, n_diff=120)
    tr_imgs = imgs[train_mask]
    tr_labels = labels[train_mask]

    backbone, head, loss_fn, opt = build_reference_stack(
        args.n_ids, args.emb_size, args.lr, args.momentum,
        args.weight_decay, args.reference_root)
    backbone.train()
    head.train()

    n = len(tr_imgs)
    order = np.random.RandomState(args.seed + 2).permutation(n)
    t0 = time.time()
    pos = 0
    for step in range(args.steps):
        if pos + args.batch_size > n:
            order = np.random.RandomState(args.seed + 3 + step
                                          ).permutation(n)
            pos = 0
        sel = order[pos: pos + args.batch_size]
        pos += args.batch_size
        x = torch.tensor(tr_imgs[sel].transpose(0, 3, 1, 2))
        y = torch.tensor(tr_labels[sel])
        feats = backbone(x)
        # the reference head builds its one-hot on 'cuda' unless the
        # caller passes onehot_vec (head/metrics.py:130-134) — the same
        # CPU path tests/test_heads_parity.py uses
        one_hot = torch.zeros(len(y), args.n_ids).scatter_(
            1, y.view(-1, 1), 1)
        logits = head(feats, y, one_hot)
        loss, _ = loss_fn(logits, y)     # FocalLoss returns (loss, None)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 10 == 0 or step == args.steps - 1:
            acc = (logits.detach().argmax(1) == y).float().mean()
            print(f"step {step}: loss {loss.item():.4f} "
                  f"top1 {float(acc):.3f} "
                  f"({(time.time() - t0) / (step + 1):.1f}s/step)",
                  flush=True)

    ckpt = os.path.join(args.out, "backbone_trained.pth")
    torch.save(backbone.state_dict(), ckpt)
    # evidence that BN running stats actually moved off init
    sd = backbone.state_dict()
    rm = [v for k, v in sd.items() if k.endswith("running_mean")]
    rv = [v for k, v in sd.items() if k.endswith("running_var")]
    mean_dev = float(np.mean([float(v.abs().mean()) for v in rm]))
    var_dev = float(np.mean([float((v - 1).abs().mean()) for v in rv]))
    print(f"saved {ckpt}; BN running stats moved: "
          f"|mean| {mean_dev:.4f}, |var-1| {var_dev:.4f}", flush=True)
    print("TRAIN_REFERENCE_BASELINE_OK", flush=True)


if __name__ == "__main__":
    main()
