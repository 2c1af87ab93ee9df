"""upfirdn2d: fused conv formulation vs literal oracle vs torch primitives."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_for_facerec_tpu.ops import (make_resample_kernel, upfirdn2d,
                                          upfirdn2d_ref)


def torch_upfirdn_oracle(x_nhwc, kernel, up, down, pad):
    """Independent oracle built from torch primitives (zero-stuff, pad,
    conv2d with flipped kernel, subsample)."""
    import torch
    import torch.nn.functional as F
    x = torch.tensor(np.moveaxis(x_nhwc, -1, 1))  # NCHW
    k = torch.tensor(kernel)
    n, c, h, w = x.shape
    up_x = up_y = up
    down_x = down_y = down
    p0, p1 = pad
    z = torch.zeros(n, c, h * up_y, w * up_x)
    z[:, :, ::up_y, ::up_x] = x
    z = F.pad(z, [max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)])
    z = z[:, :, max(-p0, 0): z.shape[2] - max(-p1, 0),
          max(-p0, 0): z.shape[3] - max(-p1, 0)]
    wk = torch.flip(k, [0, 1])[None, None].repeat(c, 1, 1, 1)
    z = F.conv2d(z, wk, groups=c)
    z = z[:, :, ::down_y, ::down_x]
    return np.moveaxis(z.numpy(), 1, -1)


CONFIGS = [
    # (up, down, pad) — the dispatch modes of upfirdn2d_kernel.cu:177-211
    (1, 1, (2, 2)),
    (2, 1, (2, 1)),   # upsample + blur (Upsample module)
    (1, 2, (2, 2)),   # blur + downsample
    (1, 1, (1, 1)),
    (1, 1, (-1, -1)),  # negative pad = crop
    (2, 1, (1, 1)),
]


@pytest.mark.parametrize("up,down,pad", CONFIGS)
@pytest.mark.parametrize("ksize", [3, 4])
def test_upfirdn2d_matches_torch_oracle(up, down, pad, ksize, rng):
    x = rng.randn(2, 12, 12, 5).astype(np.float32)
    kernel = make_resample_kernel([1, 3, 3, 1][:ksize])
    want = torch_upfirdn_oracle(x, kernel, up, down, pad)
    got = np.asarray(upfirdn2d(jnp.asarray(x), kernel, up=up, down=down,
                               pad=pad))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,pad", CONFIGS[:4])
def test_upfirdn2d_fused_matches_ref(up, down, pad, rng):
    x = rng.randn(2, 10, 14, 3).astype(np.float32)
    kernel = make_resample_kernel([1, 2, 1])
    a = np.asarray(upfirdn2d(jnp.asarray(x), kernel, up=up, down=down,
                             pad=pad))
    b = np.asarray(upfirdn2d_ref(jnp.asarray(x), kernel, up=up, down=down,
                                 pad=pad))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_nonseparable_kernel(rng):
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    kernel = rng.randn(3, 3).astype(np.float32)  # full-rank
    want = torch_upfirdn_oracle(x, kernel, 1, 1, (1, 1))
    got = np.asarray(upfirdn2d(jnp.asarray(x), kernel, pad=(1, 1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_grad_flows(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    kernel = make_resample_kernel([1, 3, 3, 1])

    def f(x):
        return jnp.sum(upfirdn2d(x, kernel, up=2, pad=(2, 1)) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_upfirdn2d_asymmetric_up_down_matches_ref(rng):
    """Tuple up/down configs (e.g. up=(2,1)) vs the literal oracle —
    upfirdn2d_ref used to crash on tuples, leaving these paths untested."""
    x = jnp.asarray(rng.randn(2, 6, 5, 3).astype(np.float32))
    k = jnp.asarray(rng.rand(3, 4).astype(np.float32))
    for up, down, pad in (((2, 1), 1, (1, 1)),
                          (1, (1, 2), (2, 1)),
                          ((2, 3), (3, 1), (1, 2))):
        got = upfirdn2d(x, k, up=up, down=down, pad=pad)
        want = upfirdn2d_ref(x, k, up=up, down=down, pad=pad)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
