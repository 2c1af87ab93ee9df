"""Data-parallel inference over the mesh: generator synthesis and backbone
embedding with batch sharding produce single-device-identical outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import irse, stylegan2_ada as ada
from stylegan_for_facerec_tpu.parallel import make_mesh


def test_generator_dp_inference(rng, devices):
    mesh = make_mesh(data=8, model=1)
    g = ada.Generator(z_dim=32, w_dim=32, w_num_layers=2, img_resolution=16)
    params, state = g.init(jax.random.key(0))
    z = jnp.asarray(rng.randn(16, 32).astype(np.float32))

    @jax.jit
    def synth(params, state, z):
        img, _ = g.apply(params, state, z, nn.Ctx(train=False),
                         noise_mode="const")
        return img

    want = synth(params, state, z)
    with mesh:
        zs = jax.device_put(z, NamedSharding(mesh, P("data", None)))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        ss = jax.device_put(state, NamedSharding(mesh, P()))
        got = synth(ps, ss, zs)
        assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_stage3_remat_matches(rng):
    from stylegan_for_facerec_tpu.train import Stage3Config, Stage3Trainer

    class Tiny(irse.Backbone):
        def _children(self):
            ch = super()._children()
            blocks = [(64, 64, 2), (64, 128, 2), (128, 256, 2),
                      (256, 512, 2)]
            ch["body"] = nn.Sequential(
                *[irse.BottleneckIR(i, d, s) for i, d, s in blocks])
            return ch

    x = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 32, 8))
    outs = []
    for remat in (False, True):
        bb = Tiny(input_size=32, num_layers=50, emb_size=64)
        cfg = Stage3Config(emb_size=64, num_classes=32, remat=remat,
                           freeze_backbone_epochs=0,
                           compute_dtype="float32")
        tr = Stage3Trainer(bb, cfg, steps_per_epoch=10)
        params, state, opt = tr.init(jax.random.key(0))
        mask = tr.freeze_mask(params, frozen=False)
        p2, _, _, m = tr.train_step(params, state, opt, x, y,
                                    jax.random.key(1),
                                    jnp.zeros((), jnp.int32), mask)
        outs.append((float(m["loss"]),
                     np.asarray(p2["head"]["weight"])))
    assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4,
                               atol=1e-6)


def test_spatial_sharded_synthesis_matches_single(rng, devices):
    """8 devices cooperating on ONE image over the height dim (GSPMD halo
    exchange) must reproduce single-device synthesis exactly in value —
    threefry noise is a pure function of the key, partitioning only
    re-tiles the same conv reductions."""
    from stylegan_for_facerec_tpu.parallel import (make_mesh,
                                                   make_spatial_synthesis)

    g = ada.Generator(z_dim=32, w_dim=32, w_num_layers=2, img_resolution=64)
    params, state = g.init(jax.random.key(0))
    z = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    key = jax.random.key(5)

    @jax.jit
    def single(params, state, z, key):
        img, _ = g.apply(params, state, z, nn.Ctx(train=False, rng=key),
                         noise_mode="random")
        return img

    want = np.asarray(single(params, state, z, key))

    mesh = make_mesh(data=8, model=1)
    synth = make_spatial_synthesis(g, mesh, axis="data")
    got = synth(params, state, z, key)
    # the result must actually live sharded across all 8 devices
    assert len(got.sharding.device_set) == 8
    spec = got.sharding.spec
    assert spec[1] == "data", spec
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_spatial_shard_fn_guards_small_heights(devices):
    from stylegan_for_facerec_tpu.parallel import (make_mesh,
                                                   spatial_shard_fn)

    mesh = make_mesh(data=8, model=1)
    fn = spatial_shard_fn(mesh, "data", min_rows_per_shard=2)
    small = jnp.zeros((1, 8, 8, 4))     # 1 row/shard < min 2: pass through
    tiny = jnp.zeros((1, 4, 4, 4))      # H=4 not divisible by 8
    ok = jnp.zeros((1, 16, 16, 4))
    with mesh:
        assert fn(small) is small
        assert fn(tiny) is tiny
        out = jax.jit(fn)(ok)
    assert out.shape == ok.shape


def test_spatial_sharded_rosinality_matches_single(rng, devices):
    from stylegan_for_facerec_tpu.models import stylegan2 as sg2
    from stylegan_for_facerec_tpu.parallel import (make_mesh,
                                                   make_spatial_synthesis)

    g = sg2.Generator(size=64, style_dim=32, n_mlp=2)
    params, state = g.init(jax.random.key(0))
    z = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    key = jax.random.key(9)

    @jax.jit
    def single(params, state, z, key):
        img, _ = g.apply(params, state, z, nn.Ctx(train=False, rng=key),
                         randomize_noise=False)
        return img

    want = np.asarray(single(params, state, z, key))
    mesh = make_mesh(data=8, model=1)
    synth = make_spatial_synthesis(g, mesh, randomize_noise=False)
    got = synth(params, state, z, key)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_spatial_hook_engages_in_both_generators(rng, devices):
    """The Ctx.shard_fn hook must actually be CALLED per block with the
    growing pyramid resolutions (the match tests alone would pass even if
    the hook were never wired — out_shardings forces the final layout)."""
    from stylegan_for_facerec_tpu.models import stylegan2 as sg2

    seen_ada, seen_ros = [], []

    def record(into):
        def fn(x):
            if getattr(x, "ndim", 0) == 4:
                into.append(int(x.shape[1]))
            return x
        return fn

    g = ada.Generator(z_dim=16, w_dim=16, w_num_layers=1,
                      img_resolution=32)
    p, s = g.init(jax.random.key(0))
    z = jnp.zeros((1, 16))
    g.apply(p, s, z, nn.Ctx(train=False, rng=jax.random.key(1),
                            shard_fn=record(seen_ada)),
            noise_mode="const")
    assert 32 in seen_ada and max(seen_ada) == 32

    g2 = sg2.Generator(size=32, style_dim=16, n_mlp=1)
    p2, s2 = g2.init(jax.random.key(0))
    g2.apply(p2, s2, jnp.zeros((1, 16)),
             nn.Ctx(train=False, shard_fn=record(seen_ros)),
             randomize_noise=False)
    assert 32 in seen_ros and max(seen_ros) == 32


def test_spatial_synthesis_hlo_is_partitioned(devices):
    """The compiled module must run convs on HEIGHT SHARDS with halo
    exchanges (collective-permute), not all-gather the image and compute
    replicated — the whole point of spatial sharding (verified on 128^2:
    convs lower to per-device H=16 slices, 0 all-gathers)."""
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P
    from stylegan_for_facerec_tpu.parallel import (make_mesh,
                                                   spatial_shard_fn)

    g = ada.Generator(z_dim=16, w_dim=16, w_num_layers=1,
                      img_resolution=64)
    params, state = g.init(jax.random.key(0))
    mesh = make_mesh(data=8, model=1)
    shard = spatial_shard_fn(mesh)
    rep = NamedSharding(mesh, P())
    out = NamedSharding(mesh, P(None, "data", None, None))

    @partial(jax.jit, in_shardings=(rep, rep, rep, rep),
             out_shardings=out)
    def synth(p, s, z, k):
        img, _ = g.apply(p, s, z,
                         nn.Ctx(train=False, rng=k, shard_fn=shard))
        return img

    txt = synth.lower(params, state, jnp.zeros((1, 16)),
                      jax.random.key(1)).compile().as_text()
    assert "all-gather" not in txt
    assert "collective-permute" in txt
