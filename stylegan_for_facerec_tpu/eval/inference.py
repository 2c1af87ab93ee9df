"""Inference utilities: iterative ReStyle inversion, encoder
bootstrapping, batch feature extraction, image visualization helpers.

Parity targets:
  * ``run_on_batch`` — ``/root/reference/restyle-encoder/utils/
    inference_utils.py:4-38``: n refinement iterations with const noise,
    per-iteration outputs and latents collected;
  * encoder bootstrapping — ``scripts/encoder_bootstrapping_inference.py:
    116-144``: net1 produces the initial inversion, net2 iterates;
  * ``extract_feature`` — ``/root/reference/util/extract_feature_v1.py:
    39-91``: folder dataset, ccrop transform, flip-TTA summed embeddings,
    L2 norm;
  * ``tensor2im`` — ``restyle-encoder/utils/common.py:5-12``.

TPU-native: the whole n-iteration refinement compiles into one jitted
call; TTA batches run device-side.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import Ctx, Layer
from ..ops.image import hflip, resize_bilinear


def run_on_batch(model, params, state, inputs: jax.Array, avg_image,
                 n_iters: int, resize_outputs: bool = True, quant=None):
    """inputs: (B, H, W, 3) [-1,1]; returns (outputs per iter, latents per
    iter) with shapes (iters, B, ...).

    ``quant``: optional ``nn.Ctx.quant`` hook (``utils/quantize.py``) —
    an ``Int8Apply(entries)`` built fresh per trace serves the whole
    refinement loop (encoder convs/linears + decoder modconvs) on the
    MXU's int8 lane; a ``_Recorder`` calibrates it (run eagerly)."""
    y_hat, latent = None, None
    outs, lats = [], []
    ctx = Ctx(train=False, quant=quant)
    for it in range(n_iters):
        cond = jnp.broadcast_to(avg_image[None], inputs.shape) if it == 0 \
            else y_hat
        x_input = jnp.concatenate([inputs, cond], axis=-1)
        (y_hat, latent), _ = model.apply(
            params, state, (x_input, latent), ctx, resize=resize_outputs,
            randomize_noise=False, return_latents=True)
        outs.append(y_hat)
        lats.append(latent)
        # resize back to the input size for the next conditioning
        y_hat = resize_bilinear(y_hat, inputs.shape[1], inputs.shape[2])
    return jnp.stack(outs), jnp.stack(lats)


def encoder_bootstrap(model1, vars1, model2, vars2, inputs, avg_image1,
                      n_iters: int, resize_outputs: bool = True):
    """Encoder bootstrapping (``encoder_bootstrapping_inference.py``):
    model1 runs a single pass from its avg image to produce the initial
    (y_hat, latent); model2 then runs the remaining refinement iterations
    from that state."""
    ctx = Ctx(train=False)
    p1, s1 = vars1
    p2, s2 = vars2
    x_input = jnp.concatenate(
        [inputs, jnp.broadcast_to(avg_image1[None], inputs.shape)], axis=-1)
    (y_hat, latent), _ = model1.apply(p1, s1, (x_input, None), ctx,
                                      resize=resize_outputs,
                                      randomize_noise=False,
                                      return_latents=True)
    outs, lats = [y_hat], [latent]
    for _ in range(1, n_iters):
        cond = resize_bilinear(y_hat, inputs.shape[1], inputs.shape[2])
        x_input = jnp.concatenate([inputs, cond], axis=-1)
        (y_hat, latent), _ = model2.apply(p2, s2, (x_input, latent), ctx,
                                          resize=resize_outputs,
                                          randomize_noise=False,
                                          return_latents=True)
        outs.append(y_hat)
        lats.append(latent)
    return jnp.stack(outs), jnp.stack(lats)


def extract_features_from_folder(backbone: Layer, params, state, root: str,
                                 input_size: int = 112,
                                 emb_size: int = 512, batch_size: int = 256,
                                 tta: bool = True) -> np.ndarray:
    """``extract_feature_v1.py:39-91`` semantics: ImageFolder scan, resize
    128 -> center-crop 112 -> normalize, flip-TTA sum, L2 norm."""
    from ..data.dataset import FacesDataset
    from .verify_runner import compute_embeddings, make_embed_fn

    ds = FacesDataset(root, image_size=int(128 * input_size / 112))
    imgs = []
    for i in range(len(ds)):
        item = ds.load(i)
        if item is None:
            imgs.append(np.zeros((ds.image_size, ds.image_size, 3),
                                 np.float32))
        else:
            imgs.append(item[0])
    arr = np.stack(imgs) if imgs else np.zeros(
        (0, ds.image_size, ds.image_size, 3), np.float32)
    # images are already at 128; embed fn center-crops to 112 w/ TTA
    embed = make_embed_fn(backbone, params, state, tta=tta, ccrop=True,
                          quantize=False)
    return compute_embeddings(embed, arr, batch_size, emb_size)


def extract_feature_single(backbone: Layer, params, state, img_path: str,
                           tta: bool = True) -> np.ndarray:
    """``extract_feature_v2.py:16-71``: cv2 BGR read -> resize 128 ->
    center-crop 112 -> BGR-to-RGB -> (x - 127.5)/128 -> flip-TTA sum ->
    L2 norm. Returns (1, emb)."""
    import cv2
    img = cv2.imread(img_path)
    resized = cv2.resize(img, (128, 128))
    cc = resized[8:120, 8:120][..., ::-1]           # crop + BGR->RGB
    cc = np.asarray(cc, np.float32)
    cc = (cc - 127.5) / 128.0
    x = jnp.asarray(cc[None])
    ctx = Ctx(train=False)
    e1, _ = backbone.apply(params, state, x, ctx)
    if tta:
        e2, _ = backbone.apply(params, state, hflip(x), ctx)
        e = e1 + e2
    else:
        e = e1
    e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
    return np.asarray(e)


def tensor2im(x: jax.Array) -> np.ndarray:
    """(H, W, 3) [-1,1] -> uint8 image (``common.py:5-12``)."""
    arr = np.asarray(x)
    arr = np.clip((arr + 1) / 2, 0, 1) * 255
    return arr.astype(np.uint8)


def face_grid(entries: List[Dict]) -> np.ndarray:
    """Compact replacement of ``vis_faces`` (``common.py:14-47``): tile
    [input | target | outputs...] rows into one uint8 image array."""
    rows = []
    for e in entries:
        imgs = [tensor2im(e["input_face"]), tensor2im(e["target_face"])]
        outs = e["output_face"]
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        imgs += [tensor2im(o) for o in outs]
        h = max(im.shape[0] for im in imgs)
        imgs = [np.pad(im, ((0, h - im.shape[0]), (0, 0), (0, 0)))
                for im in imgs]
        rows.append(np.concatenate(imgs, axis=1))
    w = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0))) for r in rows]
    return np.concatenate(rows, axis=0)
