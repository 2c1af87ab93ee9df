"""Int8 post-training quantization (utils/quantize.py): calibration /
weight quantization / int8 serving must approximate the f32 model
closely enough for embedding workloads, with zero model changes.

Beyond-reference capability (the reference has no quantized serving);
the numeric recipe is the standard symmetric per-channel scheme, checked
here against the framework's own f32 forward as the oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import irse
from stylegan_for_facerec_tpu.utils import quantize as q


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _tiny_model():
    return nn.Sequential(
        nn.Conv2d(3, 16, 3, padding=1, use_bias=False),
        nn.BatchNorm2d(16),
        nn.PReLU(16),
        nn.Conv2d(16, 32, 3, stride=2, padding=1),
        nn.PReLU(32),
        nn.Flatten(),
        nn.Linear(32 * 8 * 8, 24),
    )


def test_tiny_net_roundtrip(rng):
    model = _tiny_model()
    params, state = model.init(jax.random.key(0))
    batches = [jnp.asarray(rng.randn(8, 16, 16, 3), jnp.float32)
               for _ in range(3)]
    table = q.calibrate_and_quantize(model, params, state, batches)
    assert len(table.entries) == 3      # 2 convs + 1 linear
    lean = q.strip_quantized_weights(params, table)
    # stripped: every quantized weight is a 0-d placeholder, biases kept
    assert lean["3"]["weight"].shape == ()
    assert lean["3"]["bias"].shape == (32,)

    x = jnp.asarray(rng.randn(8, 16, 16, 3), jnp.float32)
    ref, _ = model.apply(params, state, x, nn.Ctx(train=False))
    fn = jax.jit(lambda p, s, t, xx: q.quantized_apply(model, p, s, xx, t))
    got, _ = fn(lean, state, table.entries, x)
    ref, got = np.asarray(ref), np.asarray(got)
    cos = (ref * got).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
    assert cos.min() > 0.998, cos.min()
    assert np.abs(ref - got).max() / np.abs(ref).max() < 0.1


def test_depthwise_and_grouped_conv(rng):
    model = nn.Sequential(nn.Conv2d(8, 8, 3, padding=1, groups=8),
                          nn.Conv2d(8, 16, 1, groups=2))
    params, state = model.init(jax.random.key(1))
    # xavier on 1x1 grouped convs gives near-zero weights; widen them so
    # the comparison is not vacuous
    params = jax.tree_util.tree_map(lambda a: a * 3.0, params)
    batches = [jnp.asarray(rng.randn(4, 8, 8, 8), jnp.float32)]
    table = q.calibrate_and_quantize(model, params, state, batches)
    x = jnp.asarray(rng.randn(4, 8, 8, 8), jnp.float32)
    ref, _ = model.apply(params, state, x, nn.Ctx(train=False))
    got, _ = q.quantized_apply(model, params, state, x, table.entries)
    ref, got = np.asarray(ref), np.asarray(got)
    # two stacked int8 ops: bound the error relative to the output RANGE
    # (elementwise rtol is meaningless near zero crossings)
    assert np.abs(got - ref).max() < 0.08 * np.abs(ref).max()


def test_calibration_inside_jit_raises(rng):
    model = _tiny_model()
    params, state = model.init(jax.random.key(0))
    x = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)

    def bad(xx):
        return q.calibrate_and_quantize(model, params, state, [xx])

    with pytest.raises(ValueError, match="OUTSIDE jit"):
        jax.jit(bad)(x)


def test_make_embed_fn_int8_serving_surface(rng):
    """The RFW-protocol embedding path (ccrop + flip-TTA + L2 norm,
    eval/verify_runner.make_embed_fn) with int8_table= must track the
    f32 path closely — this is the function test_rfw/verify_parity
    drive, so closeness here is closeness in verification accuracy."""
    from stylegan_for_facerec_tpu.eval.verify_runner import make_embed_fn
    from stylegan_for_facerec_tpu.models import mobilefacenet

    model = mobilefacenet.MobileFaceNet(embedding_size=128)
    params, state = model.init(jax.random.key(3))
    calib = [jnp.asarray(rng.randn(4, 112, 112, 3) * 0.5, jnp.float32)]
    table = q.calibrate_and_quantize(model, params, state, calib)
    lean = q.strip_quantized_weights(params, table)

    imgs = jnp.asarray(rng.randn(6, 128, 128, 3) * 0.5, jnp.float32)
    f32 = make_embed_fn(model, params, state)(imgs)
    i8 = make_embed_fn(model, lean, state, int8_table=table)(imgs)
    cos = (np.asarray(f32) * np.asarray(i8)).sum(-1)   # both L2-normed
    assert cos.min() > 0.97, cos


def test_generator_synthesis_int8_close(rng):
    """StyleGAN2-ADA synthesis under the modconv int8 hook (VERDICT r4
    next #5b): the scaled-activation modconv's base weight is static, so
    the synthesis/inversion SERVING path quantizes too. Images must stay
    close to the f32 render; demodulation stays f32 via the recorded
    ``w_sq``."""
    from stylegan_for_facerec_tpu.models import stylegan2_ada

    g = stylegan2_ada.Generator(img_resolution=32)
    gp, gs = g.init(jax.random.key(5))
    zs = [jnp.asarray(rng.randn(4, 512), jnp.float32) for _ in range(2)]
    table = q.calibrate_and_quantize(g, gp, gs, zs,
                                     apply_kwargs={"noise_mode": "const"})
    # prologue conv1+torgb, then (conv0, conv1, torgb) x {8, 16, 32}
    assert len(table.entries) == 11
    # demodulated convs carry w_sq for the f32 demod; torgb (1x1,
    # demodulate=False) does not
    assert sum("w_sq" in e for e in table.entries) == 7
    lean = q.strip_quantized_weights(gp, table)

    z = jnp.asarray(rng.randn(4, 512), jnp.float32)
    ref, _ = g.apply(gp, gs, z, nn.Ctx(train=False), noise_mode="const")
    fn = jax.jit(lambda p, s, t, zz: q.quantized_apply(
        g, p, s, zz, t, noise_mode="const"))
    got, _ = fn(lean, gs, table.entries, z)
    ref, got = np.asarray(ref), np.asarray(got)
    # image-space closeness relative to the output range (11 stacked
    # int8 convs; elementwise rtol is meaningless near zero crossings)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 0.15, err


def test_inversion_int8_pipeline(rng):
    """Whole-loop int8 inversion serving (run_on_batch quant= +
    calibrate_with): encoder convs/linears and decoder modconvs share
    one calibrated table across the refinement iterations; the jitted
    int8 loop must track the f32 loop."""
    from stylegan_for_facerec_tpu.eval.inference import run_on_batch
    from stylegan_for_facerec_tpu.models.psp import PSp

    model = PSp(output_size=16, input_size=16)
    pp, ps = model.init(jax.random.key(7))
    avg = jnp.zeros((16, 16, 3), jnp.float32)
    calib = [jnp.asarray(rng.randn(2, 16, 16, 3).clip(-1, 1), jnp.float32)]
    table = q.calibrate_with(
        lambda x, hook: run_on_batch(model, pp, ps, x, avg, 2,
                                     quant=hook), calib)
    # encoder conv2d/linear calls AND decoder modconv calls, twice (one
    # entry per call per refinement iteration)
    assert len(table.entries) > 20
    lean = q.strip_quantized_weights(pp, table)

    x = jnp.asarray(rng.randn(3, 16, 16, 3).clip(-1, 1), jnp.float32)
    ref_outs, ref_lats = run_on_batch(model, pp, ps, x, avg, 2)
    fn = jax.jit(lambda p, s, t, xx: run_on_batch(
        model, p, s, xx, avg, 2, quant=q.Int8Apply(t)))
    got_outs, got_lats = fn(lean, ps, table.entries, x)
    assert got_outs.shape == ref_outs.shape
    ref_o, got_o = np.asarray(ref_outs), np.asarray(got_outs)
    assert np.isfinite(got_o).all()
    # refinement feedback compounds the quantization error across the 2
    # iterations; bound it relative to the f32 output range
    err = np.abs(got_o - ref_o).max() / max(np.abs(ref_o).max(), 1e-6)
    assert err < 0.35, err
    # latents (the quantity inversion consumers read) stay well aligned
    rl = np.asarray(ref_lats).reshape(-1, 512)
    gl = np.asarray(got_lats).reshape(-1, 512)
    cos = (rl * gl).sum(-1) / (np.linalg.norm(rl, axis=-1)
                               * np.linalg.norm(gl, axis=-1) + 1e-9)
    assert cos.min() > 0.97, cos.min()


def test_irse50_embedder_int8_close(rng):
    """IR-SE-50 @112px: int8 embeddings must stay close in angle to the
    f32 embeddings — the quantity verification accuracy depends on.
    Random init exercises the real depth (50 bottlenecks, SE blocks,
    112->7 reductions, 512-d head)."""
    model = irse.Backbone(input_size=112, num_layers=50, mode="ir_se",
                          emb_size=512)
    params, state = model.init(jax.random.key(0))
    batches = [jnp.asarray(rng.randn(4, 112, 112, 3) * 0.5, jnp.float32)
               for _ in range(2)]
    table = q.calibrate_and_quantize(model, params, state, batches)
    lean = q.strip_quantized_weights(params, table)
    assert table.nbytes() < 0.27 * sum(
        a.size * 4 for a in jax.tree_util.tree_leaves(params))

    x = jnp.asarray(rng.randn(4, 112, 112, 3) * 0.5, jnp.float32)
    ref, _ = model.apply(params, state, x, nn.Ctx(train=False))
    fn = jax.jit(lambda p, s, t, xx: q.quantized_apply(model, p, s, xx, t))
    got, _ = fn(lean, state, table.entries, x)
    ref = np.asarray(ref) / np.linalg.norm(ref, axis=-1, keepdims=True)
    got = np.asarray(got) / np.linalg.norm(np.asarray(got), axis=-1,
                                           keepdims=True)
    cos = (ref * got).sum(-1)
    assert cos.min() > 0.98, cos
