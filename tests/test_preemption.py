"""Preemption-safe training (beyond reference): SIGTERM mid-epoch must
produce a clean emergency checkpoint, and --resume must continue the same
epoch from the saved step. The reference's recovery story is manual
restart from the last per-epoch save (``train.py:206-232``); TPU pods get
preempted, so the CLI handles it first-class."""

import json
import os
import signal
import subprocess
import sys
import time

from test_packed_data import _write_packed

REPO = os.path.join(os.path.dirname(__file__), "..")


def _cpu_env():
    env = dict(os.environ)
    env["SGFR_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device: no mesh path
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    return env


def test_sigterm_checkpoints_and_resumes(tmp_path):
    packed = tmp_path / "packed"
    _write_packed(str(packed), n=48, size=128, n_ids=8, shard_size=24)
    cfg = {"name": "t", "data_root": str(tmp_path),
           "train_subdir": "packed", "model_root": str(tmp_path / "ckpt"),
           "backbone": "MobileFaceNet", "emb_size": 64,
           "batch_size": 8, "num_epochs": 20, "freeze_backbone_epochs": 0,
           "num_workers": 2, "eval_benchmarks": []}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    argv = [sys.executable, os.path.join(REPO, "tools", "train_stage3.py"),
            "--config", str(cfg_path)]

    proc = subprocess.Popen(argv, env=_cpu_env(), cwd=REPO,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    # wait until training steps are flowing (first per-10-batch metric row)
    metrics = tmp_path / "ckpt" / "t" / "logs" / "metrics.jsonl"
    deadline = time.time() + 600
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError(
                "trainer exited before it could be preempted:\n"
                + proc.stdout.read())
        if metrics.exists() and metrics.stat().st_size > 0:
            break
        time.sleep(0.2)
    else:
        proc.kill()
        raise AssertionError("no metrics appeared within the deadline")

    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out
    assert "[preempt] emergency checkpoint" in out, out

    # the latest checkpoint is the emergency one, tagged mid-epoch
    from stylegan_for_facerec_tpu.utils.checkpoint import (CheckpointManager,
                                                           load_metadata)
    mgr = CheckpointManager(str(tmp_path / "ckpt" / "t"))
    latest = mgr.latest()
    meta = load_metadata(latest)
    assert meta.get("preempted") is True
    saved_step = meta["step"]
    assert saved_step >= 1

    # resume: same epoch, continuing from the saved step
    proc2 = subprocess.run(
        argv + ["--resume", "--max_steps", str(saved_step + 2)],
        env=_cpu_env(), cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=900)
    assert proc2.returncode == 0, proc2.stdout
    assert (f"[resume] preempted run {latest}: continuing epoch "
            f"{meta['epoch']} from step {saved_step}") in proc2.stdout, \
        proc2.stdout

    # the resumed run progressed past the preemption point and saved a
    # NORMAL checkpoint at a later step
    latest2 = mgr.latest()
    meta2 = load_metadata(latest2)
    assert latest2 != latest
    assert not meta2.get("preempted")
