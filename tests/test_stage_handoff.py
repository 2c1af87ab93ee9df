"""Native stage-2 -> stage-3 handoff (the cross-stage contract the
reference implements via torch .pt files, ``restyle_psp.py:419-437`` +
``coach_restyle_psp.py:88``): a run dir produced by THIS framework's
stage-2 CLI must initialize the stage-3 backbone — encoder
input_layer/body transferred exactly, avg_image.npy picked up
automatically."""

import json
import os
import subprocess
import sys

import pytest

import numpy as np
import jax


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_stage3_cli_loads_native_stage2_run_dir(tmp_path, rng):
    from PIL import Image
    from stylegan_for_facerec_tpu.models.psp import BackboneEncoder
    from stylegan_for_facerec_tpu.utils.checkpoint import (
        CheckpointManager, load_checkpoint)

    # --- a stage-2-shaped run dir: manager checkpoint + avg_image.npy
    s2 = tmp_path / "stage2_run"
    enc = BackboneEncoder(num_layers=50, mode="ir_se", n_styles=2)
    e_params, e_state = enc.init(jax.random.key(3))
    CheckpointManager(str(s2)).save(
        1, {"params": {"encoder": e_params},
            "state": {"encoder": e_state}})
    avg = rng.rand(32, 32, 3).astype(np.float32) * 2 - 1
    np.save(s2 / "avg_image.npy", avg)

    # --- tiny labeled dataset
    faces = tmp_path / "faces"
    for i in range(4):
        d = faces / f"id{i}"
        d.mkdir(parents=True)
        for j in range(3):
            Image.fromarray(
                (rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(
                d / f"{j}.jpg")

    cfg = {"name": "h", "data_root": str(tmp_path),
           "train_subdir": "faces", "model_root": str(tmp_path / "ckpt"),
           "backbone": "pSp", "emb_size": 64, "input_size": [32, 32],
           "batch_size": 4, "num_epochs": 1, "freeze_backbone_epochs": 3,
           "num_workers": 1, "eval_benchmarks": [],
           "encoder_checkpoint": str(s2)}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    env = dict(os.environ)
    env["SGFR_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_stage3.py"),
         "--config", str(cfg_path), "--max_steps", "2"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=840)
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert "loaded stage-2 encoder weights (native run dir)" in proc.stdout
    assert "avg_image.npy" in proc.stdout

    # frozen first epochs -> the saved stage-3 body must equal the
    # stage-2 body EXACTLY (transfer + exactly-zero update), and the
    # auto-discovered avg image must be in state verbatim
    saved = load_checkpoint(str(tmp_path / "ckpt" / "h"))
    got_body = jax.tree_util.tree_leaves(
        saved["params"]["backbone"]["encoder"]["body"])
    want_body = jax.tree_util.tree_leaves(e_params["body"])
    assert len(got_body) == len(want_body)
    for g, w in zip(got_body, want_body):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    np.testing.assert_array_equal(
        np.asarray(saved["state"]["backbone"]["avg_image"]), avg)


@pytest.mark.slow
def test_stage2_cli_loads_native_stage1_run_dir(tmp_path, rng):
    """--stylegan_weights pointed at a tools/train_stage1.py run dir must
    initialize the frozen decoder from g_ema (and its state), closing the
    native stage-1 -> stage-2 seam (the reference hands off torch ADA
    ckpts with G.* keys, restyle-encoder/models/psp.py:67-77)."""
    from PIL import Image
    from stylegan_for_facerec_tpu.models.stylegan2_ada import Generator
    from stylegan_for_facerec_tpu.utils.checkpoint import (
        CheckpointManager, load_checkpoint)

    s1 = tmp_path / "stage1_run"
    g = Generator(img_resolution=32)        # stage-1 defaults: 512/512/8
    g_params, g_state = g.init(jax.random.key(123))
    CheckpointManager(str(s1)).save(
        1, {"g_ema": g_params, "g_state": g_state})

    src = tmp_path / "imgs"
    src.mkdir()
    for j in range(4):
        Image.fromarray(
            (rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            src / f"{j}.jpg")

    exp = tmp_path / "stage2_exp"
    env = dict(os.environ)
    env["SGFR_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_stage2.py"),
         "--source_root", str(src), "--exp_dir", str(exp),
         "--output_size", "32", "--batch_size", "2", "--max_steps", "1",
         "--lpips_lambda", "0", "--n_iters_per_batch", "1",
         "--stylegan_weights", str(s1)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=840)
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert "loaded generator weights (native stage-1 run dir)" \
        in proc.stdout

    saved = load_checkpoint(str(exp))
    got = jax.tree_util.tree_leaves(saved["params"]["decoder"])
    want = jax.tree_util.tree_leaves(g_params)
    assert len(got) == len(want)
    for a, b in zip(got, want):   # decoder frozen: transfer is bit-exact
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generator_handoff_error_paths(tmp_path):
    from stylegan_for_facerec_tpu.models.stylegan2_ada import Generator
    from stylegan_for_facerec_tpu.utils.checkpoint import (
        CheckpointManager, load_generator_handoff)

    g32 = Generator(img_resolution=32)
    p32, s32 = g32.init(jax.random.key(0))

    # a dir without g_ema must fail loudly, not KeyError
    bad = tmp_path / "not_stage1"
    CheckpointManager(str(bad)).save(1, {"params": {"x": np.zeros(2)}})
    try:
        load_generator_handoff(str(bad), g32, p32, s32)
        raise AssertionError("expected SystemExit")
    except SystemExit as e:
        assert "g_ema" in str(e)

    # a mismatched generator config must fail with the friendly message
    g64 = Generator(img_resolution=64)
    p64, s64 = g64.init(jax.random.key(1))
    run64 = tmp_path / "stage1_64"
    CheckpointManager(str(run64)).save(1, {"g_ema": p64, "g_state": s64})
    try:
        load_generator_handoff(str(run64), g32, p32, s32)
        raise AssertionError("expected SystemExit")
    except SystemExit as e:
        assert "does not match" in str(e)

    # the happy path returns the saved tree + label
    run32 = tmp_path / "stage1_32"
    CheckpointManager(str(run32)).save(1, {"g_ema": p32, "g_state": s32})
    p, s, src = load_generator_handoff(str(run32), g32, p32, s32)
    assert src == "native stage-1 run dir"
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(p32)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
