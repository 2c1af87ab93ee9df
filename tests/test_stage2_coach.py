"""Stage-2 ReStyle coach: refinement-loop train step, avg-image pipeline,
grad-accumulation semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.train import Stage2Coach, Stage2Config


@pytest.fixture(scope="module")
def coach():
    # f32 compute keeps the exact-equality/tight-tolerance tests sharp;
    # the production bf16 default is covered by test_bf16_compute_step
    cfg = Stage2Config(output_size=32, n_iters_per_batch=2,
                       lpips_lambda=0.0, l2_lambda=1.0, w_norm_lambda=0.01,
                       target_size=32, compute_dtype="float32")
    return Stage2Coach(cfg)


@pytest.fixture(scope="module")
def setup(coach):
    params, state, opt_state = coach.init(jax.random.key(0))
    state = coach.estimate_latent_avg(params, state, jax.random.key(1),
                                      n_latent=64)
    return params, state, opt_state


def test_latent_avg_estimation(coach, setup):
    params, state, _ = setup
    avg = np.asarray(state["latent_avg"])
    assert avg.shape == (coach.model.n_styles, 512)
    assert np.abs(avg).max() > 0
    # all rows identical (broadcast of w mean)
    np.testing.assert_allclose(avg[0], avg[-1])


def test_avg_image(coach, setup):
    params, state, _ = setup
    img = coach.make_avg_image(params, state, jax.random.key(2))
    assert img.shape == (32, 32, 3)
    assert np.abs(np.asarray(img)).max() <= 1.0


def test_train_step_updates_encoder_only(coach, setup, rng):
    params, state, opt_state = setup
    avg_image = coach.make_avg_image(params, state, jax.random.key(2))
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    enc_before = jax.tree_util.tree_leaves(params["encoder"])[0]
    dec_before = jax.tree_util.tree_leaves(params["decoder"])[0]
    new_params, new_state, new_opt, loss, logs, y_hat = coach.train_step(
        params, state, opt_state, x, y, avg_image, jax.random.key(3))
    assert np.isfinite(float(loss))
    assert y_hat.shape == (2, 32, 32, 3)
    enc_after = jax.tree_util.tree_leaves(new_params["encoder"])[0]
    dec_after = jax.tree_util.tree_leaves(new_params["decoder"])[0]
    assert not np.allclose(np.asarray(enc_before), np.asarray(enc_after))
    np.testing.assert_array_equal(np.asarray(dec_before),
                                  np.asarray(dec_after))
    assert "loss_l2" in logs and "loss_w_norm" in logs


def test_refinement_iterations_differ(coach, setup, rng):
    """iter-0 conditions on avg_image, iter-1 on detached y_hat — the two
    losses must differ (the refinement actually refines)."""
    params, state, _ = setup
    avg_image = coach.make_avg_image(params, state, jax.random.key(2))
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    y = x

    cfg1 = Stage2Config(output_size=32, n_iters_per_batch=1,
                        lpips_lambda=0.0, target_size=32)
    c1 = Stage2Coach(cfg1)
    l1, _, _ = c1.validate_batch(params, state, x, y, avg_image,
                                 jax.random.key(5))
    l2, _, _ = coach.validate_batch(params, state, x, y, avg_image,
                                    jax.random.key(5))
    # 2-iter total loss is the sum of two different per-iter losses
    assert float(l2) != pytest.approx(float(l1))


@pytest.mark.slow
def test_stage2_sharded_matches_single(coach, setup, rng):
    """Mesh-parallel stage-2 (batch over 'data', replicated params) must be
    numerically identical to the single-device step — the TPU replacement
    for the reference's multi-GPU DataParallel coach
    (coach_restyle_psp.py:134-136)."""
    from stylegan_for_facerec_tpu.parallel import make_mesh
    from stylegan_for_facerec_tpu.train import Stage2Coach

    params, state, opt_state = setup
    avg_image = coach.make_avg_image(params, state, jax.random.key(2))
    x = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))

    ref_params, _, ref_opt, ref_loss, ref_logs, ref_yhat = \
        coach.train_step(
            params, state, opt_state, x, y, avg_image, jax.random.key(3))

    mesh = make_mesh(data=4, model=2)
    mcoach = Stage2Coach(coach.cfg, mesh=mesh)
    with mesh:
        mp = jax.device_put(params)
        ms = jax.device_put(state)
        mo = jax.device_put(opt_state)
        m_params, _, m_opt, m_loss, m_logs, m_yhat = mcoach.train_step(
            mp, ms, mo, x, y, avg_image, jax.random.key(3))

    np.testing.assert_allclose(float(m_loss), float(ref_loss),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_yhat), np.asarray(ref_yhat),
                               rtol=1e-4, atol=1e-4)
    ref_leaf = jax.tree_util.tree_leaves(ref_params["encoder"])[0]
    m_leaf = jax.tree_util.tree_leaves(m_params["encoder"])[0]
    np.testing.assert_allclose(np.asarray(m_leaf), np.asarray(ref_leaf),
                               rtol=1e-4, atol=1e-5)


def test_validate_aggregates_batches(coach, setup, rng):
    """coach.validate (coach_restyle_psp.py:182-214): mean loss dict over
    val batches, honoring max_batches."""
    params, state, _ = setup
    avg_image = coach.make_avg_image(params, state, jax.random.key(2))
    batches = [(jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32)),
                jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32)))
               for _ in range(4)]
    logs = coach.validate(params, state, iter(batches), avg_image,
                          jax.random.key(9), max_batches=2)
    assert "loss" in logs and "loss_l2" in logs
    assert np.isfinite(logs["loss"])
    # max_batches honored: validating over just the first two batches
    logs2 = coach.validate(params, state, iter(batches[:2]), avg_image,
                           jax.random.key(9))
    np.testing.assert_allclose(logs["loss"], logs2["loss"], rtol=1e-6)


def test_train_decoder_updates_generator(rng):
    cfg = Stage2Config(output_size=32, n_iters_per_batch=1,
                       lpips_lambda=0.0, target_size=32,
                       train_decoder=True)
    c = Stage2Coach(cfg)
    params, state, opt_state = c.init(jax.random.key(0))
    state = c.estimate_latent_avg(params, state, jax.random.key(1),
                                  n_latent=32)
    avg = c.make_avg_image(params, state, jax.random.key(2))
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    # NOTE: the mapping network is unused in pSp forward (codes come from
    # the encoder + latent_avg), so only SYNTHESIS params receive grads
    dec_before = jax.tree_util.tree_leaves(
        params["decoder"]["synthesis"])[0]
    map_before = jax.tree_util.tree_leaves(params["decoder"]["mapping"])[0]
    new_params, _, _, loss, _, _ = c.train_step(params, state, opt_state,
                                                x, x, avg,
                                                jax.random.key(3))
    dec_after = jax.tree_util.tree_leaves(
        new_params["decoder"]["synthesis"])[0]
    map_after = jax.tree_util.tree_leaves(
        new_params["decoder"]["mapping"])[0]
    assert np.isfinite(float(loss))
    # Ranger's first-step updates are ~lr=1e-4 scale: exact inequality
    assert np.any(np.asarray(dec_before) != np.asarray(dec_after))
    np.testing.assert_array_equal(np.asarray(map_before),
                                  np.asarray(map_after))


def test_train_step_updates_bn_running_stats(coach, setup, rng):
    """Regression: the coach used to discard the model state, so encoder
    BN running stats stayed at init (mean 0, var 1) forever and any
    eval-mode use of a stage-2 checkpoint normalized with garbage
    statistics (reference trains with net.train(), coach:137)."""
    params, state, opt_state = setup
    avg_image = coach.make_avg_image(params, state, jax.random.key(2))
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 3)
    _, new_state, _, _, _, _ = coach.train_step(
        params, state, opt_state, x, x, avg_image, jax.random.key(3))
    mean_before = np.asarray(
        state["encoder"]["input_layer"]["1"]["mean"])
    mean_after = np.asarray(
        new_state["encoder"]["input_layer"]["1"]["mean"])
    assert not np.allclose(mean_before, mean_after)
    # latent_avg is carried untouched
    np.testing.assert_array_equal(np.asarray(state["latent_avg"]),
                                  np.asarray(new_state["latent_avg"]))


def test_bf16_compute_step(rng):
    """The production default (compute_dtype=bfloat16): params/opt/BN
    stats stay f32 across steps (no dtype flip-flop -> no retrace), the
    loss is finite f32, and the encoder still learns."""
    cfg = Stage2Config(output_size=32, n_iters_per_batch=2,
                       lpips_lambda=0.0, l2_lambda=1.0, target_size=32)
    assert cfg.compute_dtype == "bfloat16"
    c = Stage2Coach(cfg)
    params, state, opt_state = c.init(jax.random.key(0))
    state = c.estimate_latent_avg(params, state, jax.random.key(1),
                                  n_latent=32)
    avg = c.make_avg_image(params, state, jax.random.key(2))
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    enc_before = jax.tree_util.tree_leaves(params["encoder"])[0]
    for i in range(2):
        params, state, opt_state, loss, logs, y_hat = c.train_step(
            params, state, opt_state, x, x, avg, jax.random.key(3 + i))
    assert np.isfinite(float(loss))
    assert y_hat.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    bn = state["encoder"]["input_layer"]["1"]
    assert bn["mean"].dtype == jnp.float32
    enc_after = jax.tree_util.tree_leaves(params["encoder"])[0]
    assert not np.allclose(np.asarray(enc_before), np.asarray(enc_after))
