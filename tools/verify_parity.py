#!/usr/bin/env python
"""Executable RFW parity check: reference torch stack vs this framework,
same user-supplied checkpoint, same packed benchmark data.

BASELINE.md's bar is "RFW verification accuracy within 0.1% of the
PyTorch reference at pretrained-weight parity". The published pretrained
checkpoints live on Google Drive (``/root/reference/README.md:208``) and
are unreachable offline, so the repo's golden tests use random-init
weights; THIS tool makes the claim one command away the day real weights
are available:

  python tools/verify_parity.py --torch_checkpoint backbone_ir50.pth \
      --backbone IR_50 --data_root data/rfw_packed

It (1) imports the reference's own model code from --reference_root and
runs its embedding pipeline (PIL resize-128/center-crop-112 + hflip TTA,
summed then L2-normed, ``util/utils.py:254-307``) on torch, (2) converts
the same state_dict through utils/torch_convert into our backbone and
runs eval/verify_runner.perform_val, and (3) reports per-benchmark
accuracies and the delta against the 0.1% bar.

The verification sweep itself (10-fold best-threshold,
``util/verification.py:162-172``) is this repo's vectorized
implementation for BOTH stacks — it is oracle-exact (tests/
test_verification.py), so any delta comes from the models, which is the
thing under test.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _ccrop_flip_tta_torch(batch_pm1: np.ndarray):
    """The reference's eval TTA on a float [-1,1] NHWC batch: per-image
    uint8 PIL round trip -> Resize([128,128]) -> CenterCrop(112), plus the
    horizontal flip (``util/utils.py:204-236``). Returns two NCHW torch
    tensors."""
    import torch
    from PIL import Image
    crops = []
    for img in batch_pm1:
        u8 = ((img * 0.5 + 0.5).clip(0, 1) * 255).astype(np.uint8)
        pil = Image.fromarray(u8).resize((128, 128), Image.BILINEAR)
        arr = np.asarray(pil, np.float32) / 255.0
        arr = arr[8:120, 8:120]          # CenterCrop(112) of 128
        crops.append((arr - 0.5) / 0.5)
    cc = np.stack(crops).transpose(0, 3, 1, 2)
    return torch.tensor(cc), torch.tensor(cc[:, :, :, ::-1].copy())


def torch_embeddings(model, images: np.ndarray, batch_size: int,
                     emb_size: int, tta: bool = True) -> np.ndarray:
    """perform_val's embedding loop (``util/utils.py:266-281``) on the
    reference torch model."""
    import torch
    model.eval()
    out = np.zeros((len(images), emb_size), np.float32)
    with torch.no_grad():
        for i in range(0, len(images), batch_size):
            chunk = images[i:i + batch_size]
            cc, fl = _ccrop_flip_tta_torch(chunk)
            emb = model(cc)
            if isinstance(emb, (tuple, list)):
                emb = emb[0]
            if tta:
                emb2 = model(fl)
                if isinstance(emb2, (tuple, list)):
                    emb2 = emb2[0]
                emb = emb + emb2
            emb = emb / torch.norm(emb, dim=1, keepdim=True)
            out[i:i + batch_size] = emb.cpu().numpy()
    return out


def load_avg_image(path, size: int) -> np.ndarray:
    """(H, W, C) float32 in [-1, 1]. ``path`` may be an .npy dump (the
    stage-2 coach export) or an image file (the reference's
    ``avg_image`` PNG, ``restyle_psp.py:381-389``); None means zeros —
    the avg-image concat still happens (the encoder input layer is
    hardcoded 6-channel, ``restyle_psp.py:137``), mirrored on both
    stacks so the comparison stays valid without the artifact."""
    if path is None:
        return np.zeros((size, size, 3), np.float32)
    if path.endswith(".npy"):
        arr = np.load(path).astype(np.float32)
        if arr.max() > 1.5:          # stored as uint8-range
            arr = arr / 127.5 - 1.0
    else:
        from PIL import Image
        arr = np.asarray(Image.open(path).convert("RGB"),
                         np.float32) / 127.5 - 1.0
    assert arr.shape == (size, size, 3), arr.shape
    return arr


def build_reference_model(backbone: str, checkpoint: str,
                          reference_root: str, emb_size: int,
                          avg_image: np.ndarray = None):
    """Construct the reference's own torch module and load the user
    checkpoint (``test_RFW.py:80-121`` model construction paths)."""
    import torch
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    try:  # offline containers: reuse the test stubs when available
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tests"))
        import reference_oracle
        reference_oracle.install_dep_stubs()
        reference_oracle.install_stylegan2_op_stub()
    except Exception:  # noqa: BLE001 — real deps present
        pass
    ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    if backbone == "pSp":
        from backbone.restyle_psp import pSp
        # avg_image=None here: the reference ctor imreads a file onto
        # cuda:0 (restyle_psp.py:384-389); we install the tensor
        # ourselves so the tool runs on CPU hosts
        model = pSp(size=112, encoder_type="BackboneEncoder")
        # the full-checkpoint strict load of test_RFW.py:109/118 (the
        # stage-3-trained path); ctor-time load_weights only handles
        # stage-2 restyle checkpoints without the facerec output layer
        model.load_state_dict(sd)
        model.avg_image = torch.tensor(
            avg_image.transpose(2, 0, 1)).float()
    else:
        import backbone.model_irse as m
        # the reference targets torch 1.6; its Flatten uses .view, which
        # torch>=2 rejects on non-contiguous layouts. reshape is
        # numerically identical.
        if hasattr(m, "Flatten"):
            m.Flatten.forward = lambda self, x: x.reshape(x.size(0), -1)
        model = getattr(m, backbone)([112, 112])
        model.load_state_dict(sd)
    return model


def jax_accuracy(backbone_name, sd, carray, issame, emb_size, batch_size,
                 avg_image: np.ndarray = None):
    import jax.numpy as jnp
    from stylegan_for_facerec_tpu.eval import perform_val
    from stylegan_for_facerec_tpu.models import irse, psp
    from stylegan_for_facerec_tpu.utils import torch_convert as tc
    if backbone_name == "pSp":
        import jax
        model = psp.PSpFaceRec(size=112, emb_size=emb_size)
        enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
                  if k.startswith("encoder.")} or sd
        enc_def = model._children()["encoder"]
        sp = enc_def._end_spatial
        p_enc, s_enc = tc.from_torch(
            enc_def, enc_sd,
            flatten_info={"output_layer.3": (sp, sp, 512)})
        params, state = model.init(jax.random.key(0))
        params["encoder"], state["encoder"] = p_enc, s_enc
        state["avg_image"] = jnp.asarray(avg_image)
    else:
        model = getattr(irse, backbone_name)(112, emb_size=emb_size)
        params, state = tc.from_torch(
            model, sd, flatten_info={"output_layer.3": (7, 7, 512)})
    acc, thr, _ = perform_val(model, params, state, carray, issame,
                              batch_size=batch_size, emb_size=emb_size)
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_checkpoint", required=True)
    ap.add_argument("--backbone", default="IR_50",
                    help="IR_50|IR_SE_50|...|pSp")
    ap.add_argument("--data_root", required=True,
                    help="dir with packed <name>.npz eval sets "
                    "(tools/pack_rfw.py)")
    ap.add_argument("--benchmarks", nargs="+",
                    default=["rfw_African", "rfw_Asian", "rfw_Caucasian",
                             "rfw_Indian"])
    ap.add_argument("--reference_root", default="/root/reference")
    ap.add_argument("--avg_image", default=None,
                    help="pSp only: avg-image file (.npy from the stage-2 "
                    "coach export, or the reference's PNG); zeros when "
                    "omitted, installed identically on both stacks")
    ap.add_argument("--emb_size", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--tolerance", type=float, default=0.001,
                    help="BASELINE parity bar (0.1%%)")
    args = ap.parse_args()

    import torch
    from stylegan_for_facerec_tpu.eval import load_val_pair
    from stylegan_for_facerec_tpu.eval.verification import evaluate

    avg = None
    if args.backbone == "pSp":
        avg = load_avg_image(args.avg_image, 112)
    model = build_reference_model(args.backbone, args.torch_checkpoint,
                                  args.reference_root, args.emb_size,
                                  avg_image=avg)
    ckpt = torch.load(args.torch_checkpoint, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("state_dict", ckpt)

    worst = 0.0
    rows = []
    for bench in args.benchmarks:
        carray, issame = load_val_pair(os.path.join(args.data_root, bench))
        emb_t = torch_embeddings(model, np.asarray(carray),
                                 args.batch_size, args.emb_size)
        _, _, acc_folds, _ = evaluate(emb_t, np.asarray(issame), 10)
        acc_t = float(np.mean(acc_folds))
        acc_j = float(jax_accuracy(args.backbone, sd, carray, issame,
                                   args.emb_size, args.batch_size,
                                   avg_image=avg))
        delta = abs(acc_t - acc_j)
        worst = max(worst, delta)
        rows.append((bench, acc_t, acc_j, delta))
        print(f"{bench}: torch {acc_t:.4f}  jax {acc_j:.4f}  "
              f"delta {delta * 100:.3f}%")
    verdict = "PASS" if worst <= args.tolerance else "FAIL"
    print(f"parity {verdict}: worst delta {worst * 100:.3f}% "
          f"(bar {args.tolerance * 100:.1f}%)")
    return 0 if worst <= args.tolerance else 1


if __name__ == "__main__":
    sys.exit(main())
