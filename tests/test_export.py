"""Serving export (utils/export.py): jax.export StableHLO artifacts.

The reference deploys by shipping torch checkpoints + its model code
(``test_RFW.py:41-60``); these tests pin the framework's stronger
contract — a serialized artifact that reproduces the live model exactly,
with a symbolic batch dimension and multi-platform lowering."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import mobilefacenet, stylegan2_ada
from stylegan_for_facerec_tpu.utils import export as exu
from stylegan_for_facerec_tpu.utils.checkpoint import save_checkpoint

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def embedder():
    m = mobilefacenet.MobileFaceNet(embedding_size=128)
    p, s = m.init(jax.random.key(0))
    return m, p, s


def test_embedder_export_roundtrip(tmp_path, embedder, rng):
    m, p, s = embedder
    exported = exu.export_embedder(m, p, s, platforms=("cpu", "tpu"))
    # cross-platform lowering: the artifact targets TPU serving hosts
    # even though it was produced on this CPU host
    assert set(exported.platforms) == {"cpu", "tpu"}
    assert "b,112,112,3" in str(exported.in_avals[0])

    exu.save_exported(exported, str(tmp_path), metadata={"kind": "t"})
    loaded = exu.load_exported(str(tmp_path))

    # symbolic batch: one artifact serves any batch size
    for bs in (3, 5):
        x = jnp.asarray(rng.randn(bs, 112, 112, 3), jnp.float32)
        want, _ = m.apply(p, s, x, nn.Ctx(train=False))
        got = loaded.call(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_export_sidecar_metadata(tmp_path, embedder):
    m, p, s = embedder
    exported = exu.export_embedder(m, p, s, platforms=("cpu",), batch=4)
    exu.save_exported(exported, str(tmp_path), metadata={"kind": "emb"})
    import json
    meta = json.load(open(tmp_path / "export.json"))
    assert meta["kind"] == "emb"
    assert meta["platforms"] == ["cpu"]
    # pinned batch is visible to consumers without deserializing
    assert meta["in_avals"] == ["float32[4,112,112,3]"]


def test_generator_export_roundtrip(tmp_path, rng):
    g = stylegan2_ada.Generator(img_resolution=32)
    p, s = g.init(jax.random.key(1))
    exported = exu.export_generator(g, p, s, platforms=("cpu",))
    exu.save_exported(exported, str(tmp_path))
    loaded = exu.load_exported(str(tmp_path))

    z = jnp.asarray(rng.randn(2, 512), jnp.float32)
    want, _ = g.apply(p, s, z, nn.Ctx(train=False), noise_mode="const")
    got = loaded.call(z)
    assert got.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_embedder_export_sharded_roundtrip(tmp_path, embedder, rng,
                                           devices):
    """Multi-chip serving artifact: batch sharded over the 8-device mesh,
    numerics equal to the single-device export."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stylegan_for_facerec_tpu.parallel import make_mesh

    m, p, s = embedder
    mesh = make_mesh(data=8)
    exported = exu.export_embedder_sharded(m, p, s, mesh)
    assert exported.nr_devices == 8
    # symbolic batch = multiples of the data-axis size
    assert str(exported.in_avals[0].shape[0]) in ("8*b", "b*8")

    exu.save_exported(exported, str(tmp_path))
    loaded = exu.load_exported(str(tmp_path))

    x = jnp.asarray(rng.randn(16, 112, 112, 3), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = np.asarray(loaded.call(xs))
    want, _ = m.apply(p, s, x, nn.Ctx(train=False))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_export_cli_end_to_end(tmp_path, embedder, rng):
    """tools/export_model.py: checkpoint dir -> artifact -> same numbers."""
    m, p, s = embedder
    ckpt_dir = tmp_path / "ckpt"
    out_dir = tmp_path / "artifact"
    save_checkpoint(str(ckpt_dir), {"params": p, "state": s})

    env = dict(os.environ)
    env["SGFR_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         "--kind", "embedder", "--backbone", "MobileFaceNet",
         "--emb_size", "128", "--checkpoint", str(ckpt_dir),
         "--out", str(out_dir), "--platforms", "cpu"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=840)
    assert proc.returncode == 0, proc.stdout
    assert "exported embedder" in proc.stdout

    loaded = exu.load_exported(str(out_dir))
    x = jnp.asarray(rng.randn(2, 112, 112, 3), jnp.float32)
    want, _ = m.apply(p, s, x, nn.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(loaded.call(x)),
                               np.asarray(want), rtol=1e-5, atol=1e-6)
