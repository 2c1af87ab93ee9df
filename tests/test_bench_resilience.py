"""bench.py resilience contract (VERDICT r1 weak #2): the parent retry
loop must always yield one parseable JSON line, even when the measurement
child dies on transient backend-init failures."""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def test_extract_json_line_picks_last_metric_dict():
    text = "\n".join([
        "random log line",
        json.dumps({"not_metric": 1}),
        json.dumps({"metric": "old", "value": 1}),
        "E0816 some XLA warning {not json",
        json.dumps({"metric": "new", "value": 2}),
        "trailing noise",
    ])
    assert bench.extract_json_line(text)["metric"] == "new"
    assert bench.extract_json_line("no json here") is None


def _with_probe(main_runner):
    """Wrap an injected runner so bench's device-probe pre-step passes."""
    def runner(argv, env, timeout):
        if env.get(bench._CHILD_ENV) == "probe":
            return 0, "PROBE_OK\n", ""
        return main_runner(argv, env, timeout)
    return runner


def test_run_with_retries_survives_transient_failures():
    calls = {"n": 0}
    good = json.dumps({"metric": "m", "value": 3.0, "unit": "x",
                       "vs_baseline": 1.0})

    def flaky_runner(argv, env, timeout):
        calls["n"] += 1
        if calls["n"] < 3:
            return 1, "", ("RuntimeError: Unable to initialize backend "
                           "'axon': UNAVAILABLE")
        return 0, "warmup noise\n" + good + "\n", ""

    res = bench.run_with_retries(["python", "bench.py"], attempts=3,
                                 backoff_s=0.01,
                                 runner=_with_probe(flaky_runner))
    assert calls["n"] == 3
    assert res["metric"] == "m" and res["value"] == 3.0


def test_run_with_retries_total_failure_emits_degraded_line():
    def dead_runner(argv, env, timeout):
        return 1, "", "RuntimeError: tunnel down"

    res = bench.run_with_retries(["python", "bench.py"], attempts=2,
                                 backoff_s=0.01,
                                 runner=_with_probe(dead_runner))
    # must still be a driver-parseable result line
    line = json.dumps(res)
    parsed = json.loads(line)
    assert parsed["metric"] == bench.PRIMARY_METRIC
    assert isinstance(parsed["value"], float)
    assert "error" in parsed["extras"]


def test_run_with_retries_wedged_tunnel_probe_short_circuits():
    """A hanging backend must burn only probe timeouts, never the full
    child timeout, and still end in a degraded JSON line."""
    calls = {"probe": 0, "main": 0}

    def wedged_runner(argv, env, timeout):
        if env.get(bench._CHILD_ENV) == "probe":
            calls["probe"] += 1
            raise bench.subprocess.TimeoutExpired(argv, timeout)
        calls["main"] += 1
        return 0, "", ""

    res = bench.run_with_retries(["x"], attempts=3, backoff_s=0.01,
                                 runner=wedged_runner)
    assert calls["probe"] == 3 and calls["main"] == 0
    assert res["metric"] == bench.PRIMARY_METRIC
    assert "probe" in res["extras"]["error"]


def test_child_env_flag_set_for_children():
    seen = {}

    def runner(argv, env, timeout):
        if env.get(bench._CHILD_ENV) == "probe":
            return 0, "PROBE_OK\n", ""
        seen.update(env)
        return 0, json.dumps({"metric": "m", "value": 1.0}), ""

    bench.run_with_retries(["x"], attempts=1, runner=runner)
    assert seen.get(bench._CHILD_ENV) == "1"


def test_bench_parent_side_is_jax_free():
    """Importing bench (the parent) must not import jax — a poisoned
    backend in the parent would defeat the whole retry design."""
    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    head = src.split("def _scan_time_per_iter", 1)[0]
    assert "import jax" not in head


def test_flops_child_reports_train_step_flops():
    """The axon backend lacks cost analysis; the CPU-lowered flops child is
    the MFU denominator. Run it at tiny settings and sanity-check scaling:
    fwd+bwd+SGD of IR-SE-50 must exceed 3 GFLOP/img (fwd alone is ~12)."""
    import subprocess

    env = dict(os.environ)
    env[bench._CHILD_ENV] = "flops"
    env["BENCH_TRAIN_BATCH"] = "4"
    env["BENCH_TRAIN_CLASSES"] = "64"
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__),
                                      "bench.py")],
        env=env, stdout=subprocess.PIPE, text=True, timeout=600)
    assert proc.returncode == 0
    lines = [l for l in proc.stdout.splitlines() if l.startswith("FLOPS ")]
    assert lines, proc.stdout[-500:]
    flops = float(lines[-1].split()[1])
    assert flops / 4 > 3e9


def test_data_pipeline_bench_runs():
    extras = {}
    bench._bench_data_pipeline(extras)
    assert extras["native_loader_imgs_per_sec"] > 0


def test_synthesis_prng_ab_picks_winner_and_restores_default(monkeypatch):
    """_bench_synthesis A/Bs threefry vs the hardware RBG, records the
    winner in extras, and must RESTORE the pre-call default impl — the
    re-application for downstream phases happens explicitly in ``main``
    (ADVICE r3 #5: no leaked config side effect from the helper)."""
    import jax

    speeds = {"threefry2x32": 100.0, "rbg": 250.0}

    def fake_measure(extras):
        return speeds[jax.config.jax_default_prng_impl]

    monkeypatch.setattr(bench, "_measure_synthesis", fake_measure)
    prev = jax.config.jax_default_prng_impl
    extras = {}
    out = bench._bench_synthesis(extras)
    assert out == 250.0
    assert extras["synthesis_prng_impl"] == "rbg"
    assert extras["synthesis_threefry2x32_imgs_per_sec"] == 100.0
    assert extras["synthesis_rbg_imgs_per_sec"] == 250.0
    assert jax.config.jax_default_prng_impl == prev


def test_synthesis_prng_ab_survives_one_impl_failing(monkeypatch):
    import jax

    def fake_measure(extras):
        if jax.config.jax_default_prng_impl == "rbg":
            raise RuntimeError("unsupported on this backend")
        return 42.0

    monkeypatch.setattr(bench, "_measure_synthesis", fake_measure)
    extras = {}
    assert bench._bench_synthesis(extras) == 42.0
    assert extras["synthesis_prng_impl"] == "threefry2x32"
    assert extras["synthesis_rbg_imgs_per_sec"] == 0.0
    assert jax.config.jax_default_prng_impl == "threefry2x32"


def test_synthesis_prng_ab_skips_second_impl_when_budget_thin(monkeypatch):
    """With <1200s of bench budget left after the first measurement, the
    A/B must settle for the proven impl instead of starving the
    downstream phases of compile time."""
    import jax

    calls = []

    def fake_measure(extras):
        calls.append(jax.config.jax_default_prng_impl)
        return 100.0

    monkeypatch.setattr(bench, "_measure_synthesis", fake_measure)
    extras = {}
    out = bench._bench_synthesis(extras, budget_left=lambda: 600.0)
    assert out == 100.0
    assert calls == ["threefry2x32"]
    assert extras["synthesis_prng_impl"] == "threefry2x32"
    assert "synthesis_rbg_imgs_per_sec" not in extras
    assert jax.config.jax_default_prng_impl == "threefry2x32"


def test_last_good_roundtrip(tmp_path):
    """A successful run persists; a degraded line cites it in extras
    without substituting the 0.0 value."""
    path = str(tmp_path / "last_good.json")
    good = {"metric": bench.PRIMARY_METRIC, "value": 3705.0,
            "unit": "imgs/sec/chip", "vs_baseline": 5.9, "extras": {}}
    bench.record_last_good(good, path=path)
    assert os.path.exists(path)

    degraded = bench.degraded_result("probe timed out")
    out = bench.attach_last_good(degraded, path=path)
    assert out["value"] == 0.0                      # never substituted
    lg = out["extras"]["last_good"]
    assert lg["value"] == 3705.0 and lg["recorded_at"]

    # a good result passes through untouched and never gains last_good
    out2 = bench.attach_last_good(dict(good), path=path)
    assert "last_good" not in out2["extras"]


def test_last_good_not_recorded_for_degraded(tmp_path):
    path = str(tmp_path / "last_good.json")
    bench.record_last_good(bench.degraded_result("x"), path=path)
    assert not os.path.exists(path)
    # attach with no file is a no-op
    d = bench.attach_last_good(bench.degraded_result("x"), path=path)
    assert "last_good" not in d["extras"]
