"""tools/test_rfw.py CLI end-to-end (the `test_RFW.py:12-169` analog),
including the --int8 PTQ serving comparison: the quantized accuracy must
land within a small delta of f32 on the same packed pairs."""

import os
import re
import subprocess
import sys

import numpy as np
import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_rfw_cli_int8_delta(tmp_path):
    from stylegan_for_facerec_tpu.models import irse
    from stylegan_for_facerec_tpu.utils.checkpoint import save_checkpoint

    backbone = irse.IR_SE_50(112)
    params, state = backbone.init(jax.random.key(0))
    save_checkpoint(str(tmp_path / "ckpt"),
                    {"params": params, "state": state})

    # Separable pairs: same-pairs are near-duplicate images (any network,
    # random-init included, maps them to near-identical embeddings), diff
    # pairs are independent noise. Fully random pairs put EVERY pair at
    # the decision boundary, where a one-pair flip under int8 rounding
    # equals the full 1/n_pairs accuracy granularity (observed: delta
    # exactly -0.1 on coin-flip baselines, 2026-08-20 slow-tier run).
    rng = np.random.RandomState(0)
    n_pairs = 16
    issame = rng.rand(n_pairs) > 0.5
    images = np.empty((2 * n_pairs, 128, 128, 3), np.float32)
    for i in range(n_pairs):
        a = rng.rand(128, 128, 3).astype(np.float32) * 2 - 1
        if issame[i]:
            b = np.clip(a + 0.02 * rng.randn(128, 128, 3), -1, 1)
        else:
            b = rng.rand(128, 128, 3).astype(np.float32) * 2 - 1
        images[2 * i] = a
        images[2 * i + 1] = b
    np.savez(tmp_path / "synth.npz", images=images, issame=issame)

    env = dict(os.environ)
    env["SGFR_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test_rfw.py"),
         "--checkpoint", str(tmp_path / "ckpt"),
         "--data_root", str(tmp_path),
         "--benchmarks", "synth",
         "--backbone", "IR_SE_50", "--batch_size", "16", "--int8"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-3000:]
    m = re.search(r"synth: accuracy (\d\.\d+)", proc.stdout)
    m8 = re.search(r"synth: int8 accuracy (\d\.\d+) \(delta ([+-]\d\.\d+)\)",
                   proc.stdout)
    assert m and m8, proc.stdout[-2000:]
    # separable pairs: even a random-init embedder scores high, so both
    # precisions sit far from the fold thresholds and the int8 delta
    # (cos ~0.999 per embedding, test_quantize) cannot flip pairs
    assert float(m.group(1)) > 0.7, proc.stdout[-2000:]
    assert abs(float(m8.group(2))) < 0.1, proc.stdout[-2000:]
