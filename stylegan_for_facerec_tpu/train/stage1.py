"""Stage-1 StyleGAN2-ADA GAN pretraining.

The reference does not vendor a stage-1 trainer — it delegates to the
external ``stylegan2-ada-lightning`` repo and ships only the config
(``/root/reference/README.md:118-123``,
``/root/reference/configs/stage_1_config.yaml``). This module implements
that training recipe TPU-natively for the shipped generator:

  * non-saturating logistic GAN loss,
  * lazy R1 gradient penalty on reals (lambda_gp, every
    ``lazy_gradient_penalty_interval`` steps),
  * lazy path-length regularization on G (lambda_plp),
  * ADA: adaptive discriminator augmentation with the r_t = E[sign(D(x))]
    controller toward ``ada_target`` (full stylegan2-ada menu — pixel
    blitting, general geometric, color, frequency filtering, noise +
    cutout — see ``train/ada_aug.py``; per-image Bernoulli(p) gating),
  * g_ema parameter averaging,

all as jitted G/D alternating steps with explicit state (ada_p, pl_mean,
ema params).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..models.stylegan2 import Discriminator
from ..models.stylegan2_ada import Generator
from ..nn import Ctx
from ..utils.config import Stage1Config
from .ada_aug import (ada_augment, apply_ada,  # noqa: F401 — re-export;
                      sample_ada_params)
# the full stylegan2-ada menu (blit/geom/color/filter/corrupt) lives in
# train/ada_aug.py


class Stage1Trainer:
    """Alternating jitted D/G steps with lazy regularization.

    ``mesh=``: data-parallel GAN training over a device mesh (batch over
    'data', G/D replicated, XLA grad all-reduce). The reference outsources
    stage 1 to a single-node lightning trainer (``README.md:118-123``);
    this is the TPU-native scale-out path."""

    def __init__(self, cfg: Stage1Config, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.G = Generator(z_dim=cfg.z_dim, w_dim=cfg.w_dim,
                           w_num_layers=cfg.num_mapping_layers,
                           img_resolution=cfg.image_size)
        self.D = Discriminator(size=cfg.image_size)
        # ADA-lightning style Adam betas (0.0, 0.99) for GANs
        self.tx_g = optax.adam(cfg.lr_g, b1=0.0, b2=0.99, eps=1e-8)
        self.tx_d = optax.adam(cfg.lr_d, b1=0.0, b2=0.99, eps=1e-8)
        self._jit_d_step = jax.jit(self._d_step,
                                   static_argnames=("do_r1",))
        self._jit_g_step = jax.jit(self._g_step,
                                   static_argnames=("do_plp",))

    def _augment(self, key, x, p):
        """ADA with mesh-aware execution: randomness is sampled as
        batched tensors, then the deterministic per-image transform chain
        runs inside ``shard_map`` over the data axis when a mesh is
        present. The SPMD partitioner never analyzes the warp's
        gather/scatter (which took minutes of compile), shards do zero
        communication, and sharded output is BIT-IDENTICAL to the
        single-device path (same sampled parameters either way)."""
        prm = sample_ada_params(key, x.shape[0], x.shape[1], x.shape[2],
                                x.shape[3], p)
        n_data = (1 if self.mesh is None
                  else int(self.mesh.shape.get("data", 1)))
        if n_data <= 1 or x.shape[0] % n_data != 0:
            return apply_ada(x, prm)
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map          # jax >= 0.8
            kw = {"check_vma": False}
        except ImportError:                    # pragma: no cover
            from jax.experimental.shard_map import shard_map
            kw = {"check_rep": False}
        return shard_map(apply_ada, mesh=self.mesh,
                         in_specs=(P("data"), P("data")),
                         out_specs=P("data"), **kw)(x, prm)

    def init(self, key):
        kg, kd = jax.random.split(key)
        g_params, g_state = self.G.init(kg)
        d_params, _ = self.D.init(kd)
        train_state = {
            "g": g_params, "d": d_params, "g_state": g_state,
            "g_ema": jax.tree_util.tree_map(jnp.copy, g_params),
            "opt_g": self.tx_g.init(g_params),
            "opt_d": self.tx_d.init(d_params),
            "ada_p": jnp.asarray(self.cfg.ada_start_p, jnp.float32),
            "rt_accum": jnp.zeros((), jnp.float32),
            "rt_count": jnp.zeros((), jnp.float32),
            "pl_mean": jnp.zeros((), jnp.float32),
            "step": jnp.zeros((), jnp.int32),
        }
        if self.mesh is not None:
            from ..parallel import mesh as mesh_lib
            train_state = jax.device_put(
                train_state, mesh_lib.replicated(self.mesh))
        return train_state

    # -- D step ------------------------------------------------------------

    def _d_loss(self, d_params, g_params, g_state, reals, z, ada_p, rng,
                do_r1):
        k1, k2, k3 = jax.random.split(rng, 3)
        ctx = Ctx(train=True, rng=k1)
        fakes, _ = self.G.apply(g_params, g_state, z, ctx,
                                noise_mode="random")
        fakes = jax.lax.stop_gradient(fakes)
        reals_aug = self._augment(k2, reals, ada_p)
        fakes_aug = self._augment(k3, fakes, ada_p)
        d_real, _ = self.D.apply(d_params, {}, reals_aug, ctx)
        d_fake, _ = self.D.apply(d_params, {}, fakes_aug, ctx)
        loss = jnp.mean(jax.nn.softplus(d_fake)) \
            + jnp.mean(jax.nn.softplus(-d_real))
        rt = jnp.mean(jnp.sign(d_real))

        if do_r1:
            def d_sum(x):
                y, _ = self.D.apply(d_params, {}, x, ctx)
                return jnp.sum(y)
            grads = jax.grad(d_sum)(reals_aug)
            r1 = jnp.mean(jnp.sum(jnp.square(
                grads.astype(jnp.float32)), axis=(1, 2, 3)))
            # lazy reg: scale by the interval so the time-average matches
            loss = loss + (self.cfg.lambda_gp / 2) * r1 \
                * self.cfg.lazy_gradient_penalty_interval
        return loss, rt

    def _d_step(self, state, reals, z, rng, do_r1):
        (loss, rt), grads = jax.value_and_grad(
            self._d_loss, has_aux=True)(
                state["d"], state["g"], state["g_state"], reals, z,
                state["ada_p"], rng, do_r1)
        updates, new_opt = self.tx_d.update(grads, state["opt_d"],
                                            state["d"])
        new_d = jax.tree_util.tree_map(lambda p, u: p + u, state["d"],
                                       updates)
        new_state = dict(state)
        new_state.update(d=new_d, opt_d=new_opt,
                         rt_accum=state["rt_accum"] + rt,
                         rt_count=state["rt_count"] + 1)
        return new_state, {"d_loss": loss, "rt": rt}

    # -- G step ------------------------------------------------------------

    def _g_loss(self, g_params, d_params, g_state, z, ada_p, pl_mean, rng,
                do_plp):
        k1, k2, k3 = jax.random.split(rng, 3)
        ctx = Ctx(train=True, rng=k1)
        plp = jnp.zeros((), jnp.float32)
        pl_new = pl_mean

        fakes, new_gs = self.G.apply(g_params, g_state, z, ctx,
                                     noise_mode="random")
        fakes_aug = self._augment(k2, fakes, ada_p)
        d_fake, _ = self.D.apply(d_params, {}, fakes_aug, ctx)
        loss = jnp.mean(jax.nn.softplus(-d_fake))

        if do_plp:
            # path length penalty on a half-size batch of fresh w's
            zb = z[: max(1, z.shape[0] // 2)]
            mapping = self.G._children()["mapping"]
            synthesis = self.G._children()["synthesis"]
            ws, _ = mapping.apply(g_params["mapping"],
                                  g_state["mapping"], zb,
                                  Ctx(train=False))

            def gen_from_ws(ws):
                ctx2 = Ctx(train=True, rng=k3)
                img, _ = synthesis.apply(g_params["synthesis"],
                                         g_state["synthesis"], ws, ctx2,
                                         noise_mode="random")
                return img

            img, jvp_fn = jax.vjp(gen_from_ws, ws)
            noise = jax.random.normal(k3, img.shape, img.dtype) \
                / jnp.sqrt(img.shape[1] * img.shape[2])
            (pl_grads,) = jvp_fn(noise)
            pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(
                pl_grads.astype(jnp.float32)), axis=2), axis=1))
            pl_new = pl_mean + 0.01 * (jnp.mean(pl_lengths) - pl_mean)
            plp = jnp.mean(jnp.square(pl_lengths - pl_new))
            loss = loss + self.cfg.lambda_plp * plp \
                * self.cfg.lazy_path_penalty_interval
        return loss, (new_gs, pl_new, plp)

    def _g_step(self, state, z, rng, do_plp):
        (loss, (new_gs, pl_new, plp)), grads = jax.value_and_grad(
            self._g_loss, has_aux=True)(
                state["g"], state["d"], state["g_state"], z,
                state["ada_p"], state["pl_mean"], rng, do_plp)
        updates, new_opt = self.tx_g.update(grads, state["opt_g"],
                                            state["g"])
        new_g = jax.tree_util.tree_map(lambda p, u: p + u, state["g"],
                                       updates)
        ema = self.cfg.ema_beta
        new_ema = jax.tree_util.tree_map(
            lambda e, p: ema * e + (1 - ema) * p, state["g_ema"], new_g)
        new_state = dict(state)
        new_state.update(g=new_g, opt_g=new_opt, g_state=new_gs,
                         g_ema=new_ema, pl_mean=pl_new,
                         step=state["step"] + 1)
        return new_state, {"g_loss": loss, "plp": plp}

    # -- ADA controller ----------------------------------------------------

    def update_ada(self, state, n_seen_per_interval: int,
                   ada_kimg: float = 500.0):
        """Adjust p toward ada_target from the accumulated r_t sign
        statistic (ADA heuristic); call every ``ada_interval`` D steps."""
        if self.cfg.ada_fixed:
            return state
        rt = state["rt_accum"] / jnp.maximum(state["rt_count"], 1)
        adjust = jnp.sign(rt - self.cfg.ada_target) \
            * n_seen_per_interval / (ada_kimg * 1000.0)
        new_p = jnp.clip(state["ada_p"] + adjust, 0.0, 1.0)
        new_state = dict(state)
        new_state.update(ada_p=new_p,
                         rt_accum=jnp.zeros(()), rt_count=jnp.zeros(()))
        return new_state

    # -- public ------------------------------------------------------------

    def train_step(self, state, reals, rng, step: Optional[int] = None):
        """One full iteration: D step (with lazy R1), G step (with lazy
        PLP), ADA controller tick.

        Pass ``step`` (a host-side counter) in hot loops: the default
        ``int(state["step"])`` read blocks on the device (one full-step
        sync per iteration through the ~30ms-RTT tunnel), serializing
        dispatch. The CLI threads its own counter."""
        cfg = self.cfg
        if step is None:
            step = int(state["step"])
        kd, kg, kz1, kz2 = jax.random.split(rng, 4)
        z1 = jax.random.normal(kz1, (reals.shape[0], cfg.z_dim))
        z2 = jax.random.normal(kz2, (reals.shape[0], cfg.z_dim))
        if self.mesh is not None:
            from ..parallel import mesh as mesh_lib
            bs = mesh_lib.batch_sharding(self.mesh)
            reals, z1, z2 = (jax.device_put(a, bs)
                             for a in (reals, z1, z2))
        do_r1 = (step % cfg.lazy_gradient_penalty_interval) == 0
        do_plp = step >= cfg.lazy_path_penalty_after and \
            (step % cfg.lazy_path_penalty_interval) == 0
        state, d_logs = self._jit_d_step(state, reals, z1, kd, do_r1=do_r1)
        state, g_logs = self._jit_g_step(state, z2, kg, do_plp=do_plp)
        if step % cfg.ada_interval == 0 and step > 0:
            state = self.update_ada(
                state, reals.shape[0] * cfg.ada_interval)
        return state, {**d_logs, **g_logs, "ada_p": state["ada_p"]}
