"""Stage-2 ReStyle e4e coach — the adversarial/progressive variant.

Parity target: ``/root/reference/restyle-encoder/training/coach_restyle_e4e.py``:
same refinement skeleton as the pSp coach plus
  * latent-discriminator adversarial loss on the encoder
    (non-saturating softplus over the discriminated w dims, :380-389),
  * discriminator training with real w's sampled from the frozen mapping
    network, fake w's from a replay pool, lazy R1 on real w's (:497-543),
  * per-stage delta regularization ||w_i - w_0|| (:391-402),
  * progressive stage scheduling by global step (:480-485).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from ..models.e4e import E4e, LatentCodesDiscriminator, LatentCodesPool
from ..nn import Ctx
from .stage2 import Stage2Coach, Stage2Config


@dataclasses.dataclass(frozen=True)
class E4eConfig(Stage2Config):
    """adds the e4eTrainOptions knobs (``options/e4e_train_options.py``)."""

    w_discriminator_lambda: float = 0.1
    w_discriminator_lr: float = 2e-5
    r1: float = 10.0
    d_reg_every: int = 16
    delta_norm: int = 2
    delta_norm_lambda: float = 2e-4
    progressive_steps: Sequence[int] = ()
    w_pool_size: int = 50


class E4eCoach(Stage2Coach):
    def __init__(self, cfg: E4eConfig, lpips_fn=None, id_loss_fn=None,
                 mesh=None):
        super().__init__(cfg, lpips_fn=lpips_fn, id_loss_fn=id_loss_fn,
                         mesh=mesh)
        self.cfg = cfg
        self.model = E4e(output_size=cfg.output_size,
                         input_nc=cfg.input_nc)
        self.discriminator = LatentCodesDiscriminator(512, 4)
        self.tx_d = optax.adam(cfg.w_discriminator_lr, b1=0.9, b2=0.999)
        # separate replay buffers for real and fake w's
        # (coach_restyle_e4e.py:84-86 real_w_pool / fake_w_pool)
        self.real_pool = LatentCodesPool(cfg.w_pool_size)
        self.fake_pool = LatentCodesPool(cfg.w_pool_size, seed=1)
        self._jit_train_step = jax.jit(self._train_step)
        self._jit_val_losses = jax.jit(self._val_losses)
        self._jit_d_step = jax.jit(self._d_step, static_argnames=("do_r1",))
        self._jit_fake_w = jax.jit(self._fake_w)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params, state, opt_state = super().init(k1)
        d_params, _ = self.discriminator.init(k2)
        d_opt = self.tx_d.init(d_params)
        if self.mesh is not None:
            from ..parallel import mesh as mesh_lib
            rep = mesh_lib.replicated(self.mesh)
            d_params = jax.device_put(d_params, rep)
            d_opt = jax.device_put(d_opt, rep)
        return params, state, opt_state, d_params, d_opt

    def set_stage(self, stage: int):
        """Progressive schedule hook (coach_restyle_e4e.py:480-485)."""
        self.model = self.model.set_stage(stage)
        self._jit_train_step = jax.jit(self._train_step)
        self._jit_val_losses = jax.jit(self._val_losses)
        self._jit_fake_w = jax.jit(self._fake_w)

    def _dims_to_discriminate(self, n_latent: int) -> int:
        """Number of leading w rows the discriminator sees
        (coach_restyle_e4e.py:473-475: deltas_starting_dimensions
        [:stage+1], which for the progressive encoder is range(n), i.e.
        rows 0..stage; all rows when not progressive)."""
        if self.cfg.progressive_steps:
            return min(self.model.stage + 1, n_latent)
        return n_latent

    # -- encoder-side extra losses ----------------------------------------

    def _calc_loss(self, y_hat, y, x, latent, latent_avg,
                   d_params=None):
        loss, logs = super()._calc_loss(y_hat, y, x, latent, latent_avg)
        cfg = self.cfg
        if cfg.w_discriminator_lambda > 0 and d_params is not None:
            # only the dims active at the current progressive stage are
            # discriminated (coach_restyle_e4e.py:380-387); the mean over
            # dims of per-dim softplus means == one flattened mean
            nd = self._dims_to_discriminate(latent.shape[1])
            w_flat = latent[:, :nd, :].reshape(-1, latent.shape[-1])
            pred, _ = self.discriminator.apply(d_params, {}, w_flat,
                                               Ctx(train=True))
            loss_disc = jnp.mean(jax.nn.softplus(-pred))
            logs["encoder_discriminator_loss"] = loss_disc
            loss = loss + cfg.w_discriminator_lambda * loss_disc
        if cfg.progressive_steps and cfg.delta_norm_lambda > 0:
            # only the deltas ACTIVE at the current progressive stage are
            # regularized (coach_restyle_e4e.py:391-402: i in
            # 1..progressive_stage). Inactive deltas are exactly zero and
            # d||x||/dx at x=0 is NaN — summing over all of them (the old
            # behavior) poisons the gradients at early stages.
            n_active = max(0, min(self.model.stage,
                                  latent.shape[1] - 1))
            delta_loss = jnp.zeros((), latent.dtype)
            if n_active > 0:
                first_w = latent[:, 0:1, :]
                deltas = latent[:, 1:1 + n_active, :] - first_w
                delta_loss = jnp.sum(jnp.mean(jnp.linalg.norm(
                    deltas, ord=cfg.delta_norm, axis=2), axis=0))
                loss = loss + cfg.delta_norm_lambda * delta_loss
            logs["total_delta_loss"] = delta_loss
        logs["loss"] = loss
        return loss, logs

    # _refinement_losses / _val_losses are inherited from Stage2Coach
    # (they thread d_params into _calc_loss; the reference e4e validate()
    # runs net.eval() but still composes the FULL loss incl. the
    # adversarial encoder term, coach_restyle_e4e.py:260-278,341-349)

    def _train_step(self, trainable, params, state, opt_state, x, y,
                    avg_image, rng, d_params):
        (loss, (y_hat, latent, logs, new_state)), grads = \
            jax.value_and_grad(self._refinement_losses, has_aux=True)(
                trainable, params, state, x, y, avg_image, rng, d_params)
        new_state = jax.lax.stop_gradient(new_state)
        updates, new_opt = self.tx.update(grads, opt_state, trainable)
        new_trainable = jax.tree_util.tree_map(lambda p, u: p + u,
                                               trainable, updates)
        return new_trainable, new_state, new_opt, loss, logs, y_hat, latent

    def train_step(self, params, state, opt_state, x, y, avg_image, rng,
                   d_params=None):
        x, y = self._shard_batch(x, y)
        trainable = self._trainable(params)
        new_trainable, new_state, new_opt, loss, logs, y_hat, latent = \
            self._jit_train_step(trainable, params, state, opt_state, x, y,
                                 avg_image, rng, d_params)
        return (self._merge(params, new_trainable), new_state, new_opt,
                loss, logs, y_hat, latent)

    def validate_batch(self, params, state, x, y, avg_image, rng,
                       d_params=None):
        x, y = self._shard_batch(x, y)
        loss, (y_hat, latent, logs, _) = self._jit_val_losses(
            self._trainable(params), params, state, x, y, avg_image, rng,
            d_params)
        return loss, logs, y_hat

    # -- discriminator side ------------------------------------------------

    def sample_real_w(self, params, state, key, batch: int):
        """Real w's from the frozen mapping network
        (coach_restyle_e4e.py sample_real_and_fake_latents)."""
        dec = self.model._children()["decoder"]
        mapping = dec._children()["mapping"]
        z = jax.random.normal(key, (batch, 512))
        w, _ = mapping.apply(params["decoder"]["mapping"],
                             state["decoder"]["mapping"], z,
                             Ctx(train=False))
        return w[:, 0, :]

    def _d_loss(self, d_params, real_w, fake_w, do_r1):
        real_pred, _ = self.discriminator.apply(d_params, {}, real_w,
                                                Ctx(train=True))
        fake_pred, _ = self.discriminator.apply(d_params, {}, fake_w,
                                                Ctx(train=True))
        loss = jnp.mean(jax.nn.softplus(-real_pred)) \
            + jnp.mean(jax.nn.softplus(fake_pred))
        if do_r1:
            def dsum(w):
                p, _ = self.discriminator.apply(d_params, {}, w,
                                                Ctx(train=True))
                return jnp.sum(p)
            g = jax.grad(dsum)(real_w)
            r1 = jnp.mean(jnp.sum(jnp.square(g), axis=1))
            loss = loss + (self.cfg.r1 / 2) * r1 * self.cfg.d_reg_every
        return loss

    def _d_step(self, d_params, d_opt, real_w, fake_w, do_r1):
        loss, grads = jax.value_and_grad(self._d_loss)(
            d_params, real_w, fake_w, do_r1)
        updates, new_opt = self.tx_d.update(grads, d_opt, d_params)
        new_d = jax.tree_util.tree_map(lambda p, u: p + u, d_params,
                                       updates)
        return new_d, new_opt, loss

    def _fake_w(self, params, state, x, avg_image):
        """RAW encoder codes for the D update: one pass on the
        iteration-0 conditioning, WITHOUT the latent_avg offset or the
        refinement carry (coach_restyle_e4e.py:558 ``encoder(x)`` on the
        ``x_input`` of :134; train-mode stats under no_grad)."""
        x_input = jnp.concatenate(
            [x, jnp.broadcast_to(avg_image[None], x.shape)], axis=-1)
        enc = self.model._children()["encoder"]
        codes, _ = enc.apply(params["encoder"], state["encoder"], x_input,
                             Ctx(train=True))
        return jax.lax.stop_gradient(codes)

    def train_discriminator(self, params, state, d_params, d_opt, x,
                            avg_image, key, step: int):
        """One D update (coach_restyle_e4e.py:511-543 +
        sample_real_and_fake_latents :556-567): real w's from the frozen
        mapping network, fake w's from a raw encoder pass; progressive
        training restricts fake w's to the active dims; both sides go
        through their replay pools, then a 3-D fake picks its first w."""
        import numpy as np
        real_w = self.sample_real_w(params, state, key, x.shape[0])
        fake_raw = self._jit_fake_w(params, state, x, avg_image)
        if self.cfg.progressive_steps:
            fake_raw = fake_raw[
                :, :self._dims_to_discriminate(fake_raw.shape[1]), :]
        real_w = jnp.asarray(self.real_pool.query(np.asarray(real_w)))
        fake_w = jnp.asarray(self.fake_pool.query(np.asarray(fake_raw)))
        if fake_w.ndim == 3:     # pool disabled (w_pool_size=0)
            fake_w = fake_w[:, 0, :]
        real_w, fake_w = self._shard_batch(real_w, fake_w)
        do_r1 = (step % self.cfg.d_reg_every) == 0
        return self._jit_d_step(d_params, d_opt, real_w, fake_w,
                                do_r1=do_r1)

    def stage_for_step(self, step: int) -> int:
        """coach_restyle_e4e.py:480-485."""
        stage = 0
        for i, s in enumerate(self.cfg.progressive_steps):
            if step >= s:
                stage = i
        return stage
