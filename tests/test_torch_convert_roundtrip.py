"""to_torch completeness: every from_torch branch has an inverse, and
nothing is silently dropped (ADVICE r1: StyleGAN layers used to fall
through to the generic branch and vanish from exported state_dicts)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import psp, stylegan2, stylegan2_ada
from stylegan_for_facerec_tpu.utils import torch_convert as tc


def assert_trees_match(got, want, path=""):
    assert set(got) == set(want), (path, set(got) ^ set(want))
    for k in want:
        g, w = got[k], want[k]
        if isinstance(w, dict):
            assert_trees_match(g, w, f"{path}.{k}")
        else:
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"{path}.{k}")


def roundtrip(model, flatten_info=None, drop_state=()):
    params, state = model.init(jax.random.key(0))
    sd = tc.to_torch(model, params, state, flatten_info=flatten_info)
    p2, s2 = tc.from_torch(model, sd, flatten_info=flatten_info,
                           strict=False)
    state = {k: v for k, v in state.items() if k not in drop_state}
    assert_trees_match(p2, params)
    assert_trees_match(s2, state)


def test_roundtrip_ada_generator():
    roundtrip(stylegan2_ada.Generator(img_resolution=32))


def test_roundtrip_sg2_generator():
    roundtrip(stylegan2.Generator(size=32))


def test_roundtrip_psp_stage2():
    # latent_avg lives out-of-band in reference ckpts (ckpt['latent_avg'])
    roundtrip(psp.PSp(output_size=32), drop_state=("latent_avg",))


def test_roundtrip_psp_facerec():
    roundtrip(psp.PSpFaceRec(size=32),
              flatten_info={"encoder.output_layer.3": (2, 2, 512)},
              drop_state=("avg_image",))


def test_to_torch_raises_on_unhandled_layer():
    @dataclasses.dataclass(frozen=True)
    class Exotic(nn.Layer):
        def init(self, key):
            return {"mystery": jnp.ones((3,))}, {}

        def apply(self, params, state, x, ctx):
            return x * params["mystery"], {}

    model = Exotic()
    params, state = model.init(jax.random.key(0))
    with pytest.raises(ValueError, match="silently drop"):
        tc.to_torch(model, params, state)
    # but check=False preserves the old permissive behavior
    assert tc.to_torch(model, params, state, check=False) == {}
