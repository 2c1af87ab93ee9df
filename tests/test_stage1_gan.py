"""Stage-1 GAN trainer: D/G steps, lazy regularization, ADA controller,
g_ema."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_for_facerec_tpu.train.stage1 import Stage1Trainer, ada_augment
from stylegan_for_facerec_tpu.utils.config import Stage1Config


@pytest.fixture(scope="module")
def trainer():
    cfg = Stage1Config(image_size=32, batch_size=4,
                       lazy_gradient_penalty_interval=2,
                       lazy_path_penalty_interval=2,
                       ada_interval=2)
    return Stage1Trainer(cfg)


@pytest.fixture(scope="module")
def state(trainer):
    return trainer.init(jax.random.key(0))


def test_ada_augment_identity_at_p0(rng):
    x = jnp.asarray(rng.randn(4, 16, 16, 3).astype(np.float32))
    y = ada_augment(jax.random.key(0), x, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_ada_augment_changes_at_p1(rng):
    x = jnp.asarray(rng.randn(4, 16, 16, 3).astype(np.float32))
    y = ada_augment(jax.random.key(0), x, jnp.asarray(1.0))
    assert not np.allclose(np.asarray(y), np.asarray(x))
    assert y.shape == x.shape


def test_full_train_iteration(trainer, state, rng):
    reals = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))
    st = state
    logs_hist = []
    for i in range(3):
        st, logs = trainer.train_step(st, reals, jax.random.key(10 + i))
        logs_hist.append({k: float(v) for k, v in logs.items()})
    for logs in logs_hist:
        assert np.isfinite(logs["d_loss"])
        assert np.isfinite(logs["g_loss"])
    assert int(st["step"]) == 3
    # G params moved and g_ema tracked them
    g0 = jax.tree_util.tree_leaves(state["g"])[0]
    g1 = jax.tree_util.tree_leaves(st["g"])[0]
    e1 = jax.tree_util.tree_leaves(st["g_ema"])[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    assert not np.allclose(np.asarray(e1), np.asarray(g1))


def test_r1_increases_d_loss_on_reg_step(trainer, state, rng):
    reals = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))
    z = jax.random.normal(jax.random.key(1), (4, trainer.cfg.z_dim))
    l_plain, _ = trainer._d_loss(state["d"], state["g"], state["g_state"],
                                 reals, z, state["ada_p"],
                                 jax.random.key(2), do_r1=False)
    l_r1, _ = trainer._d_loss(state["d"], state["g"], state["g_state"],
                              reals, z, state["ada_p"], jax.random.key(2),
                              do_r1=True)
    assert float(l_r1) > float(l_plain)


def test_ada_controller_moves_p(trainer, state):
    st = dict(state)
    st["rt_accum"] = jnp.asarray(10.0)   # rt >> target -> p must rise
    st["rt_count"] = jnp.asarray(10.0)
    st2 = trainer.update_ada(st, n_seen_per_interval=100000)
    assert float(st2["ada_p"]) > float(st["ada_p"])
    st["rt_accum"] = jnp.asarray(-10.0)  # rt << target -> p must fall
    st3 = trainer.update_ada(st, n_seen_per_interval=100000)
    assert float(st3["ada_p"]) <= float(st["ada_p"])


def test_stage1_sharded_matches_single(trainer, state, rng):
    """mesh= data-parallel GAN step == single-device numerics (TPU-native
    scale-out for the stage the reference trains single-node)."""
    from stylegan_for_facerec_tpu.parallel import make_mesh
    from stylegan_for_facerec_tpu.utils.config import Stage1Config

    reals = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    s1, logs1 = trainer.train_step(state, reals, jax.random.key(5))

    cfg = Stage1Config(image_size=32, batch_size=8,
                       lazy_gradient_penalty_interval=2,
                       lazy_path_penalty_interval=2, ada_interval=2)
    mesh = make_mesh(data=4, model=2)
    mtr = Stage1Trainer(cfg, mesh=mesh)
    with mesh:
        ms = jax.device_put(state)
        s2, logs2 = mtr.train_step(ms, reals, jax.random.key(5))

    np.testing.assert_allclose(float(logs2["d_loss"]),
                               float(logs1["d_loss"]), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(logs2["g_loss"]),
                               float(logs1["g_loss"]), rtol=1e-4,
                               atol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1["g"])[0]
    l2 = jax.tree_util.tree_leaves(s2["g"])[0]
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-4,
                               atol=1e-5)
