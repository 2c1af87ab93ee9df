"""Learning sanity: the stage-3 trainer actually LEARNS — loss falls and
train accuracy rises on a small separable synthetic identity problem."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_for_facerec_tpu import nn
from stylegan_for_facerec_tpu.models import irse
from stylegan_for_facerec_tpu.train import Stage3Config, Stage3Trainer


class Micro(irse.Backbone):
    def _children(self):
        ch = super()._children()
        ch["body"] = nn.Sequential(
            irse.BottleneckIR(64, 128, 4, se=True),
            irse.BottleneckIR(128, 512, 4, se=True))
        return ch


def test_stage3_learns_synthetic_identities(rng):
    n_ids = 8
    # each identity = a distinct fixed color/texture pattern + noise
    protos = rng.rand(n_ids, 16, 16, 3).astype(np.float32) * 2 - 1

    def batch(key_seed, bs=32):
        r = np.random.RandomState(key_seed)
        labels = r.randint(0, n_ids, bs)
        imgs = protos[labels] + 0.15 * r.randn(bs, 16, 16, 3)
        return (jnp.asarray(imgs.astype(np.float32)),
                jnp.asarray(labels))

    backbone = Micro(input_size=16, num_layers=50, emb_size=32,
                     drop_ratio=0.0)
    cfg = Stage3Config(emb_size=32, num_classes=n_ids, lr=0.1,
                       arcface_s=16.0, margin=0.2,
                       freeze_backbone_epochs=0, stages=(),
                       compute_dtype="float32")
    tr = Stage3Trainer(backbone, cfg, steps_per_epoch=1000)
    params, state, opt = tr.init(jax.random.key(0))
    mask = tr.freeze_mask(params, frozen=False)

    losses, accs = [], []
    for step in range(60):
        x, y = batch(step)
        params, state, opt, m = tr.train_step(
            params, state, opt, x, y, jax.random.key(step),
            jnp.asarray(step), mask)
        losses.append(float(m["loss"]))
        accs.append(float(m["top1"]))

    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < 0.5 * early, (early, late)
    assert np.mean(accs[-5:]) > 0.9, accs[-5:]
