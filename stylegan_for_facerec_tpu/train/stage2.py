"""Stage-2 ReStyle pSp coach — GAN-inversion encoder pretraining.

Parity target: ``/root/reference/restyle-encoder/training/coach_restyle_psp.py``.

Key semantics preserved:
  * latent_avg estimated from the frozen generator
    (``coach:46-47`` via ``mean_latent(1e5)``), avg image synthesized,
    BUPT-cropped [35:223, 30:218] and resized to 112 (``coach:80-82``);
  * per-batch iterative refinement (``coach:138-180``): iteration 0
    concatenates (x, avg_image), later iterations (x, detach(y_hat));
    latent carry detached; per-iteration losses BACKWARDED then a single
    optimizer step — here the per-iteration losses are summed under one
    grad (mathematically identical: grads accumulate linearly);
  * loss = l2*λ + lpips*λ + w_norm*λ + id*λ (``coach:302-332``);
  * Ranger optimizer on encoder params, decoder frozen (``coach:270-278``).

TPU-first: the whole refinement loop compiles into ONE jitted step
(unrolled n_iters, static), the generator runs in bf16, and the encoder
update is a single fused optimizer application.

Multi-chip: the reference trains stage 2 with multi-GPU DataParallel
(``coach_restyle_psp.py:134-136``, ``options/train_options.py`` --n_gpus).
Here pass ``mesh=`` — the batch shards over the 'data' axis, encoder and
frozen generator replicate, and XLA inserts the gradient all-reduce over
ICI from the sharding annotations.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.psp import PSp
from ..nn import Ctx
from ..ops.image import resize_bilinear
from ..losses.identity import w_norm_loss
from ..parallel import mesh as mesh_lib
from . import optim


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    """Mirrors TrainOptions (``options/train_options.py:9-78``) and the
    README stage-2 recipe (l2 1.0, lpips 0.8, others 0,
    n_iters_per_batch 1, output 128; ``README.md:143-165``)."""

    output_size: int = 128
    input_nc: int = 6
    n_iters_per_batch: int = 1
    l2_lambda: float = 1.0
    lpips_lambda: float = 0.8
    w_norm_lambda: float = 0.0
    id_lambda: float = 0.0
    moco_lambda: float = 0.0
    learning_rate: float = 1e-4
    optim_name: str = "ranger"
    train_decoder: bool = False
    target_size: int = 112           # transforms_config: gt resized to 112
    compute_dtype: str = "bfloat16"  # encoder+generator compute dtype
    # (repo invariant: bf16 compute + f32 params/optimizer/BN-stats;
    # losses are computed in f32. f32 activations of the 256-generator
    # backward OOM a v5e at bs=128; bf16 runs it at 148 ms/step /
    # 867 imgs/s on-device — see VERIFIED.md stage-2 throughput entry)


class Stage2Coach:
    """Functional coach. Params split: {'encoder','decoder'}; only the
    encoder (plus decoder when train_decoder) receives updates."""

    def __init__(self, cfg: Stage2Config,
                 lpips_fn: Optional[Callable] = None,
                 id_loss_fn: Optional[Callable] = None,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.model = PSp(output_size=cfg.output_size, input_nc=cfg.input_nc)
        self.lpips_fn = lpips_fn
        self.id_loss_fn = id_loss_fn
        if cfg.optim_name == "ranger":
            self.tx = optim.ranger(cfg.learning_rate)
        else:
            import optax
            self.tx = optax.adam(cfg.learning_rate)
        self._jit_train_step = jax.jit(self._train_step)
        self._jit_val_losses = jax.jit(self._val_losses)

    # -- setup -------------------------------------------------------------

    def init(self, key):
        params, state = self.model.init(key)
        opt_state = self.tx.init(self._trainable(params))
        if self.mesh is not None:
            rep = mesh_lib.replicated(self.mesh)
            params = jax.device_put(params, rep)
            state = jax.device_put(state, rep)
            opt_state = jax.device_put(opt_state, rep)
        return params, state, opt_state

    def _trainable(self, params):
        if self.cfg.train_decoder:
            return params
        return {"encoder": params["encoder"]}

    def _merge(self, params, trainable):
        out = dict(params)
        out.update(trainable)
        return out

    def estimate_latent_avg(self, params, state, key,
                            n_latent: int = 100_000):
        """coach:46-47; fills state['latent_avg']."""
        dec = self.model._children()["decoder"]
        avg = dec.mean_latent(params["decoder"], state["decoder"], key,
                              n_latent)
        new_state = dict(state)
        if self.mesh is not None:
            avg = jax.device_put(avg, mesh_lib.replicated(self.mesh))
        new_state["latent_avg"] = avg
        return new_state

    def make_avg_image(self, params, state, key):
        """coach:56-88: synthesize from latent_avg, BUPT-crop
        [35:223, 30:218], resize 112. Returns (112,112,3) in [-1,1]."""
        codes = state["latent_avg"][None]
        img, _ = self.model.apply(params, state, (codes, None),
                                  Ctx(train=False, rng=key),
                                  randomize_noise=False, input_code=True,
                                  resize=True)
        img = img[:, 35:223, 30:218, :]
        img = resize_bilinear(img, self.cfg.target_size, self.cfg.target_size)
        return jnp.clip(img[0], -1, 1)

    # -- losses ------------------------------------------------------------

    def _calc_loss(self, y_hat, y, x, latent, latent_avg, d_params=None):
        """``d_params`` is accepted (and unused) so subclasses adding
        discriminator terms (E4eCoach) can share ``_refinement_losses``."""
        cfg = self.cfg
        loss = jnp.zeros((), jnp.float32)
        logs = {}
        if cfg.l2_lambda > 0:
            l2 = jnp.mean(jnp.square(y_hat - y))
            logs["loss_l2"] = l2
            loss += l2 * cfg.l2_lambda
        if cfg.lpips_lambda > 0 and self.lpips_fn is not None:
            lp = self.lpips_fn(y_hat, y)
            logs["loss_lpips"] = lp
            loss += lp * cfg.lpips_lambda
        if cfg.w_norm_lambda > 0:
            wn = w_norm_loss(latent, latent_avg)
            logs["loss_w_norm"] = wn
            loss += wn * cfg.w_norm_lambda
        if cfg.id_lambda > 0 and self.id_loss_fn is not None:
            idl, sim, _ = self.id_loss_fn(y_hat, y, x)
            logs["loss_id"] = idl
            logs["id_improve"] = sim
            loss += idl * cfg.id_lambda
        logs["loss"] = loss
        return loss, logs

    # -- refinement loop ---------------------------------------------------

    def _refinement_losses(self, trainable, params, state, x, y, avg_image,
                           rng, d_params=None, train: bool = True):
        """coach:138-166: unrolled n_iters_per_batch; returns summed loss
        (== accumulated per-iter backward) and last-iter outputs. The
        model state (encoder BN running stats) threads through the
        iterations and is returned — the reference trains with
        ``net.train()`` so each forward updates the running stats
        (coach_restyle_psp.py:137); validation passes ``train=False``
        (``net.eval()``, coach:182-214).

        The encoder+generator run in ``cfg.compute_dtype`` (params cast
        inside the grad scope, so gradients/updates stay f32); each
        iteration's outputs are cast back to f32 for the losses."""
        cfg = self.cfg
        params = self._merge(params, trainable)
        # losses are computed in f32 against the ORIGINAL source: keep an
        # f32 view of x for _calc_loss and cast only the network input
        # (ADVICE r3 #3 — previously the bf16-truncated x leaked into the
        # L2/ID loss terms)
        x_loss = x.astype(jnp.float32)
        if cfg.compute_dtype == "bfloat16":
            from ..nn import cast_floats
            params = cast_floats(params, jnp.bfloat16)
            x = x.astype(jnp.bfloat16)
            avg_image = avg_image.astype(jnp.bfloat16)
        ctx = Ctx(train=train, rng=rng)
        latent_avg = state["latent_avg"]

        y_hat = None
        latent = None
        cur_state = state
        total = jnp.zeros((), jnp.float32)
        logs = {}
        for it in range(cfg.n_iters_per_batch):
            if it == 0:
                cond = jnp.broadcast_to(avg_image[None], x.shape)
            else:
                cond = jax.lax.stop_gradient(y_hat).astype(x.dtype)
            x_input = jnp.concatenate([x, cond], axis=-1)
            carry = (None if latent is None
                     else jax.lax.stop_gradient(latent))
            (out, latent), cur_state = self.model.apply(
                params, cur_state, (x_input, carry), ctx, resize=True,
                randomize_noise=True, return_latents=True)
            y_hat = resize_bilinear(out, cfg.target_size,
                                    cfg.target_size).astype(jnp.float32)
            loss, logs = self._calc_loss(y_hat, y, x_loss,
                                         latent.astype(jnp.float32),
                                         latent_avg, d_params)
            total = total + loss
        return total, (y_hat, latent.astype(jnp.float32), logs, cur_state)

    def _val_losses(self, trainable, params, state, x, y, avg_image, rng,
                    d_params=None):
        return self._refinement_losses(trainable, params, state, x, y,
                                       avg_image, rng, d_params,
                                       train=False)

    def _train_step(self, trainable, params, state, opt_state, x, y,
                    avg_image, rng):
        (loss, (y_hat, latent, logs, new_state)), grads = \
            jax.value_and_grad(self._refinement_losses, has_aux=True)(
                trainable, params, state, x, y, avg_image, rng)
        # aux state is not differentiated; detach for cleanliness
        new_state = jax.lax.stop_gradient(new_state)
        updates, new_opt = self.tx.update(grads, opt_state, trainable)
        new_trainable = jax.tree_util.tree_map(lambda p, u: p + u,
                                               trainable, updates)
        return new_trainable, new_state, new_opt, loss, logs, y_hat

    # -- public ------------------------------------------------------------

    def train_step(self, params, state, opt_state, x, y, avg_image, rng):
        """x: (B,112,112,3) source; y: (B,112,112,3) target (both [-1,1]).
        Returns (new_params, new_state, new_opt_state, loss, logs, y_hat);
        new_state carries the updated encoder BN running statistics."""
        x, y = self._shard_batch(x, y)
        trainable = self._trainable(params)
        new_trainable, new_state, new_opt, loss, logs, y_hat = \
            self._jit_train_step(trainable, params, state, opt_state, x, y,
                                 avg_image, rng)
        return (self._merge(params, new_trainable), new_state, new_opt,
                loss, logs, y_hat)

    def validate_batch(self, params, state, x, y, avg_image, rng):
        """Step-0-style validation (coach:182-214): refinement without
        grads, eval-mode BN (net.eval()), returns logs of the final
        iteration."""
        x, y = self._shard_batch(x, y)
        loss, (y_hat, latent, logs, _) = self._jit_val_losses(
            self._trainable(params), params, state, x, y, avg_image, rng)
        return loss, logs, y_hat

    def _shard_batch(self, *arrays):
        """Place per-example arrays batch-sharded over the 'data' axis."""
        if self.mesh is None:
            return arrays
        bs = mesh_lib.batch_sharding(self.mesh)
        return tuple(jax.device_put(a, bs) for a in arrays)

    def validate(self, params, state, batches, avg_image, key,
                 max_batches: Optional[int] = None, **val_kwargs):
        """Average validation losses over an iterable of (x, y) batches —
        the coach's ``validate()`` (coach_restyle_psp.py:182-214, incl.
        the best-val-loss input). Returns the aggregated loss dict.
        Extra kwargs (e.g. the e4e coach's ``d_params``) forward to
        ``validate_batch``."""
        from ..utils.logging import aggregate_loss_dicts
        agg = []
        for bi, (x, y) in enumerate(batches):
            if max_batches is not None and bi >= max_batches:
                break
            key, k = jax.random.split(key)
            _, logs, _ = self.validate_batch(params, state, x, y,
                                             avg_image, k, **val_kwargs)
            agg.append({k2: float(v) for k2, v in logs.items()})
        return aggregate_loss_dicts(agg) if agg else {}
