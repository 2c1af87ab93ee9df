"""tools/verify_parity.py smoke (VERDICT r2 next #9): random-init torch
IR-50 as the stand-in for the unreachable published checkpoints; the CLI
must run both stacks end-to-end and report a sub-bar delta.

Same-pair images are IDENTICAL (distance 0) and diff-pairs are random, so
10-fold accuracy is a stable 1.0 in both stacks regardless of the random
weights — the PASS verdict then only depends on the pipeline running, not
on threshold luck."""

import os
import subprocess
import sys

import numpy as np
import torch

from reference_oracle import ref_import

REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_pairs(data_dir, n_pairs=12, seed=0):
    rng = np.random.RandomState(seed)
    images = np.zeros((2 * n_pairs, 112, 112, 3), np.float32)
    issame = np.zeros(n_pairs, bool)
    for i in range(n_pairs):
        a = rng.rand(112, 112, 3).astype(np.float32) * 2 - 1
        if i % 2 == 0:
            images[2 * i], images[2 * i + 1], issame[i] = a, a, True
        else:
            b = rng.rand(112, 112, 3).astype(np.float32) * 2 - 1
            images[2 * i], images[2 * i + 1] = a, b
    os.makedirs(data_dir, exist_ok=True)
    np.savez(os.path.join(data_dir, "rfw_test.npz"),
             images=images, issame=issame)


def _run_cli(ckpt_path, backbone, data_dir, extra=()):
    env = dict(os.environ)
    env["SGFR_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_parity.py"),
         "--torch_checkpoint", str(ckpt_path),
         "--backbone", backbone,
         "--data_root", str(data_dir),
         "--benchmarks", "rfw_test",
         "--batch_size", "8", *extra],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=900)


def test_verify_parity_cli_smoke(tmp_path):
    m = ref_import("backbone.model_irse")
    torch.manual_seed(3)
    model = m.IR_50([112, 112])
    ckpt_path = tmp_path / "ir50.pth"
    torch.save(model.state_dict(), str(ckpt_path))
    data = tmp_path / "data"
    _write_pairs(str(data))

    proc = _run_cli(ckpt_path, "IR_50", data)
    assert "rfw_test: torch" in proc.stdout, proc.stdout[-3000:]
    assert "parity PASS" in proc.stdout, proc.stdout[-3000:]
    assert proc.returncode == 0


def test_verify_parity_cli_psp_branch(tmp_path):
    """The pSp branch must construct the reference's 6-channel
    avg-image-conditioned model (``test_RFW.py:87-90`` + strict full
    state-dict load, ``:109/118``), install the same avg image on both
    stacks, and run end-to-end."""
    ref_psp = ref_import("backbone.restyle_psp")
    torch.manual_seed(5)
    model = ref_psp.pSp(size=112, encoder_type="BackboneEncoder")
    ckpt_path = tmp_path / "psp.pth"
    torch.save(model.state_dict(), str(ckpt_path))

    avg_path = tmp_path / "avg_image.npy"
    rng = np.random.RandomState(7)
    np.save(str(avg_path),
            (rng.rand(112, 112, 3) * 2 - 1).astype(np.float32))
    data = tmp_path / "data"
    _write_pairs(str(data))

    proc = _run_cli(ckpt_path, "pSp", data,
                    extra=("--avg_image", str(avg_path)))
    assert "rfw_test: torch" in proc.stdout, proc.stdout[-3000:]
    assert "parity PASS" in proc.stdout, proc.stdout[-3000:]
    assert proc.returncode == 0
