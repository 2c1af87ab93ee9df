"""Spatially-sharded synthesis: N chips cooperate on ONE high-res image.

Beyond the reference's parallelism surface (SURVEY §2.7 lists only
DataParallel + the chunked head): once the output resolution grows past
what one chip's HBM holds at a useful batch size, batch sharding stops
helping — a batch-1 4k-res synthesis occupies one device while the rest
idle. The reference's only gesture at this problem is the vestigial,
unused ``stylegan_subbatch_size`` knob
(``/root/reference/backbone/restyle_psp.py:365-377``), which sequentially
sub-batches on one GPU. The TPU-native answer is to shard the image's
HEIGHT dimension over the mesh and let GSPMD partition every conv with
halo exchanges over ICI — the image-resolution analog of sequence
parallelism (the "big-dimension engineering" SURVEY §5 names).

Mechanics: ``spatial_shard_fn`` returns a hook the generator's
``SynthesisNetwork`` applies to each block's activations (``Ctx.shard_fn``).
Pinning every block keeps the partitioner from giving up and
all-gathering mid-pyramid; resolutions too small to split N ways stay
replicated (the pyramid's cheap prefix), and the constraint engages the
first time H divides the axis size. Numerics are value-identical to
single-device execution: threefry noise is a pure function of the key,
and conv partitioning only re-tiles the same reductions.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn import Ctx


def spatial_shard_fn(mesh: Mesh, axis: str = "data",
                     min_rows_per_shard: int = 1):
    """Ctx.shard_fn hook: constrain NHWC activations to P(None, axis).

    Activations whose height does not divide the axis size (the 4x4/8x8
    head of the pyramid) or that would leave fewer than
    ``min_rows_per_shard`` rows per device pass through unconstrained.
    """
    n = int(mesh.shape[axis])
    spec = NamedSharding(mesh, P(None, axis, None, None))

    def fn(x):
        if (getattr(x, "ndim", 0) == 4 and x.shape[1] % n == 0
                and x.shape[1] // n >= min_rows_per_shard):
            return jax.lax.with_sharding_constraint(x, spec)
        return x

    return fn


def make_spatial_synthesis(generator, mesh: Mesh, axis: str = "data",
                           min_rows_per_shard: int = 1, **apply_kwargs):
    """Jitted ``fn(params, state, z, key) -> img`` with the synthesis
    pyramid spatially sharded over ``mesh.shape[axis]`` devices.

    Works with both generator families — extra ``apply_kwargs`` are
    forwarded verbatim to ``generator.apply`` (e.g. ``noise_mode=`` /
    ``truncation_psi=`` for the ADA generator, ``randomize_noise=`` /
    ``input_is_latent=`` for the rosinality one; an apply that returns
    ``(img, aux)`` as its output value has the image taken from index 0).

    The returned image is left sharded P(None, axis) — materialize with
    ``np.asarray`` (gathers) or keep it on-mesh for downstream sharded
    compute. Params/state/z are replicated (StyleGAN2 weights are small
    next to high-res activations; replication trades a little HBM for
    zero weight collectives).
    """
    shard = spatial_shard_fn(mesh, axis, min_rows_per_shard)
    rep = NamedSharding(mesh, P())
    out = NamedSharding(mesh, P(None, axis, None, None))

    @partial(jax.jit, in_shardings=(rep, rep, rep, rep),
             out_shardings=out)
    def synth(params, state, z, key):
        ctx = Ctx(train=False, rng=key, shard_fn=shard)
        img, _ = generator.apply(params, state, z, ctx, **apply_kwargs)
        if isinstance(img, tuple):     # e.g. return_latents=True
            img = img[0]
        return img

    return synth
