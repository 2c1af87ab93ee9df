"""Ahead-of-time serving export via ``jax.export`` (StableHLO).

The reference "deploys" by shipping torch checkpoints that must be
re-hydrated through its Python model code (``/root/reference/README.md:208``;
``test_RFW.py:41-60`` rebuilds the backbone then ``load_state_dict``).
A TPU-native framework can do better: serialize the *traced program* —
a jitted eval forward with the weights baked in as constants and the
batch dimension symbolic — so a serving process runs the model with no
framework or model code at all, and an artifact exported on a CPU dev
host runs unchanged on TPU serving hosts (``jax.export`` cross-platform
lowering; the StableHLO is compiled by the destination's XLA).

Two first-class exports cover the framework's serving surfaces:

* :func:`export_embedder` — face-recognition embedding extraction, the
  inference path behind ``extract_feature_v1/v2`` and ``test_RFW.py``.
* :func:`export_generator` — StyleGAN synthesis ``z -> image`` with
  deterministic (const) noise, the stage-1 artifact consumers sample.

Both run through :func:`export_jittable`, which any other jittable
forward can use directly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport


def export_jittable(fn, args_spec: Sequence[Any],
                    platforms: Optional[Sequence[str]] = None):
    """Export ``fn(*args)`` for the given arg specs (ShapeDtypeStructs,
    possibly with symbolic dims). Returns a ``jax.export.Exported``."""
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    return jexport.export(jax.jit(fn), **kwargs)(*args_spec)


def _symbolic_batch(shape_tail, dtype, batch: Optional[int]):
    """(b, *tail) spec — symbolic ``b`` when ``batch`` is None."""
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    return jax.ShapeDtypeStruct((b, *shape_tail), dtype)


def export_embedder(model, params, state, *, image_size: int = 112,
                    channels: int = 3, dtype=jnp.float32,
                    batch: Optional[int] = None,
                    platforms: Optional[Sequence[str]] = ("tpu", "cpu")):
    """Serving export of an embedding backbone: ``images (b,H,W,C) ->
    embeddings (b,E)``, eval mode, weights baked as constants, batch
    symbolic by default (pass ``batch=`` to pin it)."""
    from stylegan_for_facerec_tpu import nn

    def forward(images):
        emb, _ = model.apply(params, state, images, nn.Ctx(train=False))
        return emb

    spec = _symbolic_batch((image_size, image_size, channels), dtype, batch)
    return export_jittable(forward, (spec,), platforms)


def export_generator(model, params, state, *, z_dim: int = 512,
                     dtype=jnp.float32, batch: Optional[int] = None,
                     noise_mode: str = "const",
                     platforms: Optional[Sequence[str]] = ("tpu", "cpu")):
    """Serving export of a generator: ``z (b,z_dim) -> images``.
    ``noise_mode='const'`` (default) makes the artifact a pure function
    of ``z`` — per-layer noise comes from the trained const buffers, the
    deterministic choice for serving. 'random' would need an rng input,
    which ``jax.export`` supports poorly across hosts; sample z instead."""
    from stylegan_for_facerec_tpu import nn

    def forward(z):
        img, _ = model.apply(params, state, z, nn.Ctx(train=False),
                             noise_mode=noise_mode)
        return img

    spec = _symbolic_batch((z_dim,), dtype, batch)
    return export_jittable(forward, (spec,), platforms)


def export_embedder_sharded(model, params, state, mesh, *,
                            image_size: int = 112, channels: int = 3,
                            dtype=jnp.float32,
                            platforms: Optional[Sequence[str]] = None):
    """Multi-chip serving export: the batch is sharded over the mesh's
    ``data`` axis (params replicated), so one artifact drives a whole
    slice at inference. The batch dimension stays symbolic as
    ``data_size * b`` — any multiple of the data-axis size. The artifact
    records the shardings and device count; deserialize it in a process
    whose backend has ``mesh.devices.size`` devices and call on a
    committed/sharded input.

    ``platforms`` defaults to the exporting backend only: multi-chip
    artifacts embed device assignments, so cross-platform lowering is
    deliberately not defaulted here (export on the target platform)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stylegan_for_facerec_tpu import nn

    n_data = mesh.shape["data"]
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    state = jax.device_put(state, repl)

    def forward(images):
        emb, _ = model.apply(params, state, images, nn.Ctx(train=False))
        return emb

    (b,) = jexport.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((n_data * b, image_size, image_size,
                                 channels), dtype)
    fwd = jax.jit(forward,
                  in_shardings=NamedSharding(mesh, P("data")),
                  out_shardings=NamedSharding(mesh, P("data")))
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    return jexport.export(fwd, **kwargs)(spec)


def save_exported(exported, path: str, metadata: Optional[dict] = None):
    """Write the serialized artifact + a human-readable sidecar.

    ``<path>/artifact.shlo`` — ``Exported.serialize()`` bytes;
    ``<path>/export.json`` — shapes/dtypes/platforms for consumers that
    want to validate inputs without deserializing."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "artifact.shlo"), "wb") as f:
        f.write(bytes(exported.serialize()))
    meta = {
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
    }
    if metadata:
        meta.update(metadata)
    with open(os.path.join(path, "export.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_exported(path: str):
    """Deserialize an artifact saved by :func:`save_exported`. The result's
    ``.call(*args)`` runs it under jit on the current backend (which must
    be in the artifact's platform list)."""
    with open(os.path.join(path, "artifact.shlo"), "rb") as f:
        data = f.read()
    return jexport.deserialize(bytearray(data))
