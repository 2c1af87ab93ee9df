"""Driver-contract test: ``dryrun_multichip`` must succeed when invoked the
way the driver does — importing the module into a process whose environment
does NOT pre-force the virtual CPU mesh (the round-1 rc=124 failure mode:
jax initialized the real 'axon' TPU backend and the 8-device mesh hung)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_via_driver_import_path():
    env = dict(os.environ)
    # simulate the driver: no CPU forcing, no virtual-device flags
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count"))
    # the driver runs with the default ~15 min budget and may budget-skip
    # tail stages when fully cold; the slow tier runs once per round with
    # an ample budget so ALL five stages are exercised and must be OK
    env["SGFR_DRYRUN_BUDGET_S"] = "3000"
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=3300)
    assert proc.returncode == 0, (
        f"driver-path dryrun failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}")
    assert "dryrun_multichip(8): OK" in proc.stdout
    # all four trainers + the 2-process pod-slice variant completed
    # (VERDICT r2 next #5, r3 next #3) — no budget skips at this budget
    for stage in ("stage3", "stage2", "stage1", "e4e"):
        assert f"DRYRUN_STAGE {stage} OK" in proc.stdout, (
            stage, proc.stdout[-2000:])
    assert "mp3=ok" in proc.stdout
    assert "SKIP" not in proc.stdout


def test_graft_entry_module_has_no_eager_jax_import():
    """The parent-side function must stay jax-free so a poisoned backend in
    the importing process can never leak into the dry run."""
    src = open(os.path.join(REPO, "__graft_entry__.py")).read()
    head = src.split("def entry", 1)[0]
    assert "import jax" not in head
    assert "import numpy" not in head
