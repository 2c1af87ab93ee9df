"""fused_act / resample / modconv / image ops vs torch-primitive oracles."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from stylegan_for_facerec_tpu.ops import (bias_act, ccrop_tta, clamp_gain,
                                          fused_bias_act_pallas,
                                          fused_leaky_relu, hflip,
                                          modulated_conv2d,
                                          modulated_conv2d_grouped,
                                          resize_bilinear, smooth_downsample,
                                          smooth_upsample)


def to_nchw(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def to_nhwc(x):
    return np.moveaxis(np.asarray(x), 1, -1)


class TestFusedAct:
    def test_fused_leaky_relu(self, rng):
        x = rng.randn(2, 4, 4, 8).astype(np.float32)
        b = rng.randn(8).astype(np.float32)
        got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
        want = F.leaky_relu(torch.tensor(to_nchw(x))
                            + torch.tensor(b)[None, :, None, None],
                            0.2).numpy() * math.sqrt(2)
        np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-6, atol=1e-6)

    def test_clamp_gain(self, rng):
        x = rng.randn(4, 8).astype(np.float32) * 300
        got = np.asarray(clamp_gain(jnp.asarray(x), math.sqrt(2), 256.0))
        want = np.clip(x * math.sqrt(2), -256, 256)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_bias_act_lrelu_clamp(self, rng):
        x = rng.randn(2, 4, 4, 8).astype(np.float32) * 100
        b = rng.randn(8).astype(np.float32)
        got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b),
                                  act="lrelu", gain=1.0, clamp=256.0))
        t = torch.tensor(to_nchw(x)) + torch.tensor(b)[None, :, None, None]
        want = torch.clamp(F.leaky_relu(t, 0.2) * math.sqrt(2), -256, 256)
        np.testing.assert_allclose(got, to_nhwc(want.numpy()), rtol=1e-5,
                                   atol=1e-5)

    def test_pallas_matches_jnp(self, rng):
        x = jnp.asarray(rng.randn(2, 4, 4, 128).astype(np.float32))
        b = jnp.asarray(rng.randn(128).astype(np.float32))
        want = fused_leaky_relu(x, b)
        got = fused_bias_act_pallas(x, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_pallas_grad_matches_jnp(self, rng):
        x = jnp.asarray(rng.randn(2, 4, 4, 128).astype(np.float32))
        b = jnp.asarray(rng.randn(128).astype(np.float32))

        gx1, gb1 = jax.grad(
            lambda x, b: jnp.sum(fused_leaky_relu(x, b) ** 2), (0, 1))(x, b)
        gx2, gb2 = jax.grad(
            lambda x, b: jnp.sum(fused_bias_act_pallas(x, b) ** 2),
            (0, 1))(x, b)
        np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb2), np.asarray(gb1),
                                   rtol=1e-5, atol=1e-4)


class TestSmoothResample:
    def _torch_smooth_upsample(self, x_nchw):
        k = torch.tensor([[1., 3, 3, 1], [3, 9, 9, 3],
                          [3, 9, 9, 3], [1, 3, 3, 1]])[None, None]
        k = k / k.sum()
        b, c, h, w = x_nchw.shape
        x = x_nchw.reshape(-1, 1, h, w)
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = F.pad(x, (2, 1, 2, 1), mode="replicate")
        return F.conv2d(x, k).reshape(b, c, h * 2, w * 2)

    def _torch_smooth_downsample(self, x_nchw):
        k = torch.tensor([[1., 3, 3, 1], [3, 9, 9, 3],
                          [3, 9, 9, 3], [1, 3, 3, 1]])[None, None]
        k = k / k.sum()
        b, c, h, w = x_nchw.shape
        x = x_nchw.reshape(-1, 1, h, w)
        x = F.pad(x, (2, 1, 2, 1), mode="replicate")
        x = F.conv2d(x, k).reshape(b, c, h, w)
        return F.interpolate(x, scale_factor=0.5, mode="nearest",
                             recompute_scale_factor=False)

    def test_smooth_upsample(self, rng):
        x = rng.randn(2, 8, 8, 5).astype(np.float32)
        want = self._torch_smooth_upsample(torch.tensor(to_nchw(x))).numpy()
        got = np.asarray(smooth_upsample(jnp.asarray(x)))
        np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-5, atol=1e-6)

    def test_smooth_downsample(self, rng):
        x = rng.randn(2, 8, 8, 5).astype(np.float32)
        want = self._torch_smooth_downsample(torch.tensor(to_nchw(x))).numpy()
        got = np.asarray(smooth_downsample(jnp.asarray(x)))
        np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-5, atol=1e-6)


class TestModConv:
    @pytest.mark.parametrize("demodulate", [True, False])
    def test_scaled_activation_equals_grouped(self, demodulate, rng):
        x = jnp.asarray(rng.randn(3, 8, 8, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32) * 0.1)
        s = jnp.asarray(rng.rand(3, 16).astype(np.float32) + 0.5)
        a = modulated_conv2d(x, w, s, padding=1, demodulate=demodulate)
        b = modulated_conv2d_grouped(x, w, s, padding=1,
                                     demodulate=demodulate)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4)

    def test_matches_torch_grouped_reference(self, rng):
        """Directly against torch per-sample-weight grouped conv (the exact
        computation at stylegan2_ada/utils.py:120-137)."""
        n, ci, co, k, hw = 2, 8, 12, 3, 6
        x = rng.randn(n, hw, hw, ci).astype(np.float32)
        w_oikk = rng.randn(co, ci, k, k).astype(np.float32) * 0.2
        s = (rng.rand(n, ci).astype(np.float32) + 0.5)

        tw = torch.tensor(w_oikk)[None] * torch.tensor(s).reshape(n, 1, ci,
                                                                  1, 1)
        d = (tw.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
        tw = tw * d.reshape(n, co, 1, 1, 1)
        tx = torch.tensor(to_nchw(x)).reshape(1, -1, hw, hw)
        tw2 = tw.reshape(-1, ci, k, k)
        want = F.conv2d(tx, tw2, padding=1, groups=n).reshape(n, co, hw, hw)

        w_hwio = np.transpose(w_oikk, (2, 3, 1, 0))
        got = modulated_conv2d(jnp.asarray(x), jnp.asarray(w_hwio),
                               jnp.asarray(s), padding=1, demodulate=True)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want.numpy()),
                                   rtol=2e-4, atol=2e-4)


class TestImageOps:
    @pytest.mark.parametrize("src,dst", [(112, 128), (256, 112), (64, 128),
                                         (128, 112)])
    def test_resize_matches_torch_bilinear(self, src, dst, rng):
        x = rng.randn(2, src, src, 3).astype(np.float32)
        want = F.interpolate(torch.tensor(to_nchw(x)), dst, mode="bilinear",
                             align_corners=False).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(x), dst, dst))
        np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-4, atol=2e-4)

    def test_ccrop_tta_shapes(self, rng):
        x = jnp.asarray(rng.rand(4, 112, 112, 3).astype(np.float32) * 2 - 1)
        y = ccrop_tta(x)
        assert y.shape == (4, 112, 112, 3)
        assert np.abs(np.asarray(y)).max() <= 1.0 + 1e-6

    def test_hflip(self, rng):
        x = jnp.asarray(rng.randn(1, 4, 6, 3).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(hflip(hflip(x))),
                                      np.asarray(x))


class TestFusedResample:
    def test_fused_equals_unfused(self, rng):
        from stylegan_for_facerec_tpu.ops.resample import (
            smooth_downsample_unfused, smooth_upsample_unfused)
        x = jnp.asarray(rng.randn(2, 10, 14, 5).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(smooth_upsample(x)),
            np.asarray(smooth_upsample_unfused(x)), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(smooth_downsample(x)),
            np.asarray(smooth_downsample_unfused(x)), rtol=1e-5, atol=1e-5)


class TestPallasUpsample:
    def test_matches_xla_fused(self, rng):
        from stylegan_for_facerec_tpu.ops.upfirdn_pallas import (
            smooth_upsample_pallas)
        for shape, th in [((2, 16, 8, 3), 8), ((1, 32, 16, 5), 4),
                          ((1, 8, 8, 2), 8)]:
            x = jnp.asarray(rng.randn(*shape).astype(np.float32))
            got = smooth_upsample_pallas(x, tile_h=th)
            want = smooth_upsample(x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)
