"""Verification eval runner — the ``perform_val`` equivalent
(``/root/reference/util/utils.py:254-307``), device-resident.

The reference's eval loop de-normalizes every image to PIL, resizes,
center-crops, flips — one image at a time on host CPU. Here the TTA
(ccrop + hflip, embeddings summed then L2-normalized) is batched jnp on
the accelerator; the threshold sweep runs via eval/verification.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Iterable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import Ctx, Layer
from ..ops.image import ccrop_tta, hflip


def l2_norm_np(x: np.ndarray, axis: int = 1) -> np.ndarray:
    return x / np.linalg.norm(x, axis=axis, keepdims=True)


@functools.lru_cache(maxsize=32)
def _embed_jit(backbone: Layer, tta: bool, ccrop: bool, quantize: bool):
    """One jitted embed graph per (backbone config, flags): params/state
    ride as jit ARGUMENTS, so per-epoch multi-benchmark eval reuses one
    compiled graph instead of re-tracing a fresh closure each call (and
    large param trees are never serialized as literals for the
    remote-compile backend)."""

    @jax.jit
    def fn(params, state, images):
        x = ccrop_tta(images, quantize=quantize) if ccrop else images
        e1, _ = backbone.apply(params, state, x, Ctx(train=False))
        if tta:
            e2, _ = backbone.apply(params, state, hflip(x), Ctx(train=False))
            e = e1 + e2
        else:
            e = e1
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    return fn


@functools.lru_cache(maxsize=32)
def _embed_jit_int8(backbone: Layer, tta: bool, ccrop: bool,
                    quantize: bool):
    """Int8-serving twin of ``_embed_jit``: the calibrated table entries
    ride as a jit ARGUMENT (utils/quantize.py contract)."""
    from ..utils.quantize import quantized_apply

    @jax.jit
    def fn(params, state, entries, images):
        x = ccrop_tta(images, quantize=quantize) if ccrop else images
        e1, _ = quantized_apply(backbone, params, state, x, entries)
        if tta:
            e2, _ = quantized_apply(backbone, params, state, hflip(x),
                                    entries)
            e = e1 + e2
        else:
            e = e1
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    return fn


def make_embed_fn(backbone: Layer, params, state,
                  tta: bool = True, ccrop: bool = True,
                  quantize: bool = True, int8_table=None) -> Callable:
    """(B, H, W, 3) [-1,1] -> (B, emb) TTA embedding fn.

    tta=True: emb = backbone(ccrop(x)) + backbone(hflip(ccrop(x))), then
    L2 norm (the sum-then-normalize of ``util/utils.py:276-279``).

    int8_table: a ``utils.quantize.Int8Table`` switches the backbone
    matmuls to the calibrated int8 serving path (2x MXU rate on v5e);
    pass ``strip_quantized_weights(params, table)`` as ``params`` to
    also drop the f32 weights from HBM."""
    if int8_table is not None:
        try:
            fn8 = _embed_jit_int8(backbone, tta, ccrop, quantize)
        except TypeError:
            fn8 = _embed_jit_int8.__wrapped__(backbone, tta, ccrop,
                                              quantize)
        entries = int8_table.entries
        return lambda images: fn8(params, state, entries, images)
    try:
        fn = _embed_jit(backbone, tta, ccrop, quantize)
    except TypeError:   # unhashable custom Layer: fall back to a fresh jit
        fn = _embed_jit.__wrapped__(backbone, tta, ccrop, quantize)
    return lambda images: fn(params, state, images)


def compute_embeddings(embed_fn: Callable, carray: np.ndarray,
                       batch_size: int = 256, emb_size: int = 512)\
        -> np.ndarray:
    """Batch the (N, H, W, 3) or (N, 3, H, W) float array through embed_fn;
    ragged tail padded to keep a single compiled shape."""
    arr = np.asarray(carray)
    if arr.ndim == 4 and arr.shape[1] == 3 and arr.shape[-1] != 3:
        arr = np.moveaxis(arr, 1, -1)  # NCHW -> NHWC
    n = arr.shape[0]
    out = np.zeros((n, emb_size), np.float32)
    for i in range(0, n, batch_size):
        chunk = arr[i: i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        emb = np.asarray(embed_fn(jnp.asarray(chunk, jnp.float32)))
        out[i: i + batch_size] = emb[: batch_size - pad] if pad \
            else emb
    return out


def perform_val(backbone: Layer, params, state, carray, issame,
                batch_size: int = 256, emb_size: int = 512,
                nrof_folds: int = 10, tta: bool = True, ccrop: bool = True,
                int8_table=None)\
        -> Tuple[float, float, Tuple[np.ndarray, np.ndarray]]:
    """Returns (mean accuracy, mean best threshold, (tpr, fpr)) — the
    contract of ``util/utils.py:254-307`` (ROC tensor replaced by raw
    curves; plotting is the caller's concern). ``int8_table`` runs the
    quantized serving path (utils/quantize.py)."""
    from .verification import evaluate

    embed_fn = make_embed_fn(backbone, params, state, tta=tta, ccrop=ccrop,
                             int8_table=int8_table)
    embeddings = compute_embeddings(embed_fn, carray, batch_size, emb_size)
    tpr, fpr, accuracy, best = evaluate(embeddings, issame, nrof_folds)
    return float(accuracy.mean()), float(best.mean()), (tpr, fpr)


# ---------------------------------------------------------------------------
# Packed eval-set IO (bcolz replacement)
# ---------------------------------------------------------------------------

def load_val_pair(path: str):
    """Load a packed verification set. Accepts:
    - ``<path>.npz`` with arrays 'images' (N,H,W,3 float32 [-1,1]) and
      'issame' (N/2 bool) — our native format (tools/pack_rfw.py);
    - a bcolz carray dir + ``<path>_list.npy`` (the reference layout,
      ``util/utils.py:82-86``) when bcolz is importable."""
    import os
    if os.path.exists(path + ".npz"):
        d = np.load(path + ".npz")
        return d["images"], d["issame"]
    try:
        import bcolz
        carray = bcolz.carray(rootdir=path, mode="r")
        issame = np.load(path + "_list.npy")
        return np.asarray(carray), issame
    except ImportError as e:
        raise FileNotFoundError(
            f"no {path}.npz and bcolz unavailable for {path}") from e


RFW_ETHNICITIES = ("African", "Asian", "Caucasian", "Indian")


def get_rfw_val_data(data_root: str, ethnicities=RFW_ETHNICITIES):
    """RFW per-ethnicity loader (``util/utils.py:89-115`` semantics)."""
    import os
    out = {}
    for eth in ethnicities:
        p = os.path.join(data_root, f"rfw_{eth}")
        out[eth] = load_val_pair(p)
    return out
