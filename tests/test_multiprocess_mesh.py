"""Multi-process SPMD (pod-slice readiness, VERDICT r3 next #3).

Everything else in the suite runs one process that sees all 8 virtual
devices; a real v5e-16+ slice is N processes each seeing a subset. These
tests prove the last untested leap: ``jax.distributed`` joins 2 processes
x 4 CPU devices into one 8-device (data=4, model=2) mesh, each process
feeds only its ``PackedLoader`` slice of every global batch through
``device_prefetch`` (``jax.make_array_from_process_local_data``), and the
full stage-3 DP x TP train step produces the SAME numerics as one process
seeing all 8 devices.

Reference analog being replaced: single-process ``nn.DataParallel``
scatter (``/root/reference/train.py:219-222``) — it has no multi-host
story at all.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
WORKER = ["-m", "stylegan_for_facerec_tpu.parallel._mp_worker"]


def _env(n_local_devices):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices} "
        "--xla_cpu_collective_call_warn_stuck_timeout_seconds=150 "
        "--xla_cpu_collective_call_terminate_timeout_seconds=1200 "
        "--xla_cpu_collective_timeout_seconds=1200")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("SGFR_PLATFORM", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    return env


def _parse_steps(out):
    """[(loss, top1), ...] from MPSTEP lines."""
    steps = []
    for m in re.finditer(r"MPSTEP (\d+) ([-\d.]+) ([-\d.]+)", out):
        steps.append((float(m.group(2)), float(m.group(3))))
    return steps


def test_packed_loader_process_slices_cover_global_batch(tmp_path):
    """Pure-host check: N process-sliced loaders together yield exactly
    the single-loader global batch, in order."""
    from stylegan_for_facerec_tpu.data import (PackedLoader,
                                               PackedTrainDataset,
                                               write_packed)
    rng = np.random.RandomState(3)
    write_packed(str(tmp_path), rng.randint(0, 256, (40, 8, 8, 3),
                                            dtype=np.uint8),
                 rng.randint(0, 5, 40).astype(np.int32),
                 id_list=list("abcde"), shard_size=16)
    ds = PackedTrainDataset(str(tmp_path))
    whole = list(PackedLoader(ds, 8, seed=7, drop_last=True))
    parts = [list(PackedLoader(ds, 8, seed=7, drop_last=True,
                               process_id=p, num_processes=2))
             for p in range(2)]
    assert len(whole) == len(parts[0]) == len(parts[1]) == 5
    for b, (imgs, lbls) in enumerate(whole):
        got_imgs = np.concatenate([parts[0][b][0], parts[1][b][0]])
        got_lbls = np.concatenate([parts[0][b][1], parts[1][b][1]])
        np.testing.assert_array_equal(imgs, got_imgs)
        np.testing.assert_array_equal(lbls, got_lbls)
    # global batch must divide across processes; ragged tails are refused
    with pytest.raises(AssertionError):
        PackedLoader(ds, 9, num_processes=2, process_id=0)
    with pytest.raises(AssertionError):
        PackedLoader(ds, 8, num_processes=2, process_id=0, drop_last=False)


def test_two_process_stage3_matches_single_process():
    """2 procs x 4 devices == 1 proc x 8 devices, same global mesh, same
    packed data, same step count — losses must agree (collective
    reduction order may differ at float32 epsilon)."""
    single = subprocess.run(
        [sys.executable, *WORKER, "--nproc", "1", "--steps", "2"],
        env=_env(8), cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=900)
    assert single.returncode == 0, single.stdout
    assert "MP_WORKER_OK" in single.stdout, single.stdout
    ref = _parse_steps(single.stdout)
    assert len(ref) == 2

    procs = [subprocess.Popen(
        [sys.executable, *WORKER, "--nproc", "2", "--pid", str(p),
         "--port", "12731", "--steps", "2"],
        env=_env(4), cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for p in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "MP_WORKER_OK" in out, out
        assert "2 processes, 4 local / 8 global devices" in out, out
        got = _parse_steps(out)
        assert len(got) == 2
        for (l_ref, a_ref), (l_got, a_got) in zip(ref, got):
            assert abs(l_got - l_ref) < 1e-3 * max(1.0, abs(l_ref)), \
                (ref, got)
            assert abs(a_got - a_ref) < 1e-6, (ref, got)
