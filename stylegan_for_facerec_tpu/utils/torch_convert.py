"""torch checkpoint -> JAX pytree converter.

Needed day-1 for pretrained-weight parity (SURVEY.md §7 build order #1):
stage-2 checkpoints initialize the stage-3 backbone
(``/root/reference/backbone/restyle_psp.py:419-437``), and all golden-output
parity tests convert torch weights into our trees.

The converter walks the *layer definition tree* (static objects), so each
layer class declares its own torch tensor transforms:

  * ``Conv2d``      : OIHW -> HWIO transpose
  * ``Linear``      : (out,in) -> (in,out) transpose; Linears directly after
                      a Flatten of an NHWC map additionally permute the
                      flattened input axis (C,H,W) -> (H,W,C)
  * ``BatchNorm``   : weight/bias -> params, running_mean/var -> state
  * ``FullyConnectedLayer`` (equalized): torch layout kept
  * synthesis layers: conv weights transposed, ``noise_const`` -> state,
                      prologue ``const`` CHW -> HWC

Works directly on ``torch.load(...)['state_dict']``-style flat dicts whose
keys line up with our param-tree paths (guaranteed by construction: our
trees mirror the reference module names).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..nn import (BatchNorm, Conv2d, Layer, Linear, PReLU, Sequential)
from ..models import stylegan2 as sg2
from ..models import stylegan2_ada as ada


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def iter_children(layer: Layer) -> Dict[str, Layer]:
    if isinstance(layer, Sequential):
        return {str(i): l for i, l in enumerate(layer.layers)}
    if hasattr(layer, "_children"):
        return layer._children()
    return {}


def _join(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def from_torch(layer: Layer, sd: Mapping[str, "object"], prefix: str = "",
               flatten_info: Optional[Mapping[str, Tuple[int, int, int]]]
               = None, strict: bool = True):
    """Build (params, state) for ``layer`` from torch state-dict ``sd``.

    ``flatten_info`` maps param-tree paths of Linear layers that consume a
    flattened NHWC map to their (H, W, C) so the input axis is permuted
    (e.g. the IR-SE output layer ``output_layer.3`` -> (7, 7, 512)).
    """
    flatten_info = flatten_info or {}

    def get(key):
        if key not in sd:
            if strict:
                raise KeyError(f"missing torch key: {key}")
            return None
        return _np(sd[key])

    def rec(layer, prefix):
        params, state = {}, {}

        if isinstance(layer, Conv2d):
            w = get(_join(prefix, "weight"))
            if w is not None:
                params["weight"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            if layer.use_bias:
                b = get(_join(prefix, "bias"))
                if b is not None:
                    params["bias"] = jnp.asarray(b)
            return params, state

        if isinstance(layer, Linear):
            w = get(_join(prefix, "weight"))
            if w is not None:
                if prefix in flatten_info:
                    h, wd, c = flatten_info[prefix]
                    o = w.shape[0]
                    w = w.reshape(o, c, h, wd).transpose(2, 3, 1, 0)
                    w = w.reshape(h * wd * c, o)
                else:
                    w = w.T
                params["weight"] = jnp.asarray(w)
            if layer.use_bias:
                b = get(_join(prefix, "bias"))
                if b is not None:
                    params["bias"] = jnp.asarray(b)
            return params, state

        if isinstance(layer, BatchNorm):
            for name in ("weight", "bias"):
                v = get(_join(prefix, name))
                if v is not None:
                    params[name] = jnp.asarray(v)
            m = get(_join(prefix, "running_mean"))
            v = get(_join(prefix, "running_var"))
            if m is not None:
                state["mean"] = jnp.asarray(m)
            if v is not None:
                state["var"] = jnp.asarray(v)
            return params, state

        if isinstance(layer, PReLU):
            w = get(_join(prefix, "weight"))
            if w is not None:
                params["weight"] = jnp.asarray(w)
            return params, state

        if isinstance(layer, ada.FullyConnectedLayer):
            w = get(_join(prefix, "weight"))
            if w is not None:
                params["weight"] = jnp.asarray(w)   # torch layout (out, in)
            if layer.bias:
                b = get(_join(prefix, "bias"))
                if b is not None:
                    params["bias"] = jnp.asarray(b)
            return params, state

        if isinstance(layer, (ada.SynthesisLayer, ada.SynthesisLayer1)):
            params, state = rec_children(layer, prefix)
            w = get(_join(prefix, "weight"))
            if w is not None:
                params["weight"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            for name in ("bias", "noise_strength"):
                v = get(_join(prefix, name))
                if v is not None:
                    params[name] = jnp.asarray(v)
            nc = get(_join(prefix, "noise_const"))
            if nc is not None:
                state["noise_const"] = jnp.asarray(nc)
            return params, state

        if isinstance(layer, (ada.ToRGBLayer, ada.ToRGBLayer1)):
            params, state = rec_children(layer, prefix)
            w = get(_join(prefix, "weight"))
            if w is not None:
                params["weight"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            b = get(_join(prefix, "bias"))
            if b is not None:
                params["bias"] = jnp.asarray(b)
            return params, state

        if isinstance(layer, ada.EqualizedConv2d):
            w = get(_join(prefix, "weight"))
            if w is not None:
                params["weight"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            if layer.bias:
                b = get(_join(prefix, "bias"))
                if b is not None:
                    params["bias"] = jnp.asarray(b)
            return params, state

        if isinstance(layer, ada.SynthesisPrologue):
            params, state = rec_children(layer, prefix)
            c = get(_join(prefix, "const"))
            if c is not None:
                params["const"] = jnp.asarray(np.transpose(c, (1, 2, 0)))
            return params, state

        if isinstance(layer, ada.MappingNetwork):
            params, state = rec_children(layer, prefix)
            w_avg = get(_join(prefix, "w_avg")) if layer.w_avg_beta else None
            if w_avg is not None:
                state["w_avg"] = jnp.asarray(w_avg)
            return params, state

        if isinstance(layer, sg2.EqualLinear):
            w = get(_join(prefix, "weight"))
            if w is not None:
                params["weight"] = jnp.asarray(w)   # torch layout (out, in)
            if layer.bias:
                b = get(_join(prefix, "bias"))
                if b is not None:
                    params["bias"] = jnp.asarray(b)
            return params, state

        if isinstance(layer, sg2.EqualConv2d):
            w = get(_join(prefix, "weight"))
            if w is not None:
                params["weight"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            if layer.bias:
                b = get(_join(prefix, "bias"))
                if b is not None:
                    params["bias"] = jnp.asarray(b)
            return params, state

        if isinstance(layer, sg2.ModulatedConv2d):
            params, state = rec_children(layer, prefix)
            w = get(_join(prefix, "weight"))     # (1, O, I, k, k)
            if w is not None:
                params["weight"] = jnp.asarray(
                    np.transpose(w[0], (2, 3, 1, 0)))
            return params, state

        if isinstance(layer, sg2.NoiseInjection):
            w = get(_join(prefix, "weight"))
            if w is not None:
                params["weight"] = jnp.asarray(w)
            return params, state

        if isinstance(layer, sg2.StyledConv):
            params, state = rec_children(layer, prefix)
            b = get(_join(prefix, "activate.bias"))
            if b is not None:
                params["activate"] = {"bias": jnp.asarray(b)}
            return params, state

        if isinstance(layer, sg2.ToRGB):
            params, state = rec_children(layer, prefix)
            b = get(_join(prefix, "bias"))       # (1, 3, 1, 1)
            if b is not None:
                params["bias"] = jnp.asarray(b.reshape(-1))
            return params, state

        if isinstance(layer, sg2.ConvLayer):
            params, state = rec_children(layer, prefix)
            if layer.activate and layer.bias:
                act_idx = 2 if layer.downsample else 1
                b = get(_join(prefix, f"{act_idx}.bias"))
                if b is not None:
                    params[str(act_idx)] = {"bias": jnp.asarray(b)}
            return params, state

        if isinstance(layer, sg2.Generator):
            params, state = rec_children(layer, prefix)
            c = get(_join(prefix, "input.input"))   # (1, C, 4, 4)
            if c is not None:
                params["input"] = {"input": jnp.asarray(
                    np.transpose(c, (0, 2, 3, 1)))}
            noises = {}
            for li in range(layer.num_layers):
                nz = get(_join(prefix, f"noises.noise_{li}"))
                if nz is not None:
                    noises[f"noise_{li}"] = jnp.asarray(
                        np.transpose(nz, (0, 2, 3, 1)))
            if noises:
                state["noises"] = noises
            return params, state

        from ..models import efficientnet as effnet
        if isinstance(layer, effnet.SamePadConv):
            w = get(_join(prefix, "weight"))
            if w is not None:
                params["weight"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            if layer.bias:
                b = get(_join(prefix, "bias"))
                if b is not None:
                    params["bias"] = jnp.asarray(b)
            return params, state

        # generic container (Backbone, SEModule, blocks, Generator, ...)
        return rec_children(layer, prefix)

    def rec_children(layer, prefix):
        params, state = {}, {}
        for name, child in iter_children(layer).items():
            p, s = rec(child, _join(prefix, name))
            if p:
                params[name] = p
            if s:
                state[name] = s
        return params, state

    return rec(layer, prefix)


def _leaf_paths(tree, base=()):
    """Set of tuple-paths to array leaves of a nested-dict tree."""
    if isinstance(tree, Mapping):
        paths = set()
        for k, v in tree.items():
            paths |= _leaf_paths(v, base + (str(k),))
        return paths
    return {base} if tree is not None else set()


# state entries stored out-of-band in reference checkpoints (ckpt['latent_avg'],
# avg_image.jpg on disk) rather than in the module state_dict
_OUT_OF_BAND_STATE = ("latent_avg", "avg_image")


def to_torch(layer: Layer, params, state=None, prefix: str = "",
             flatten_info: Optional[Mapping[str, Tuple[int, int, int]]]
             = None, check: bool = True) -> dict:
    """Inverse of ``from_torch``: emit a torch-layout flat state_dict
    (numpy arrays) from our (params, state) trees — enables exporting
    trained models back to the reference toolchain. Every ``from_torch``
    branch has its inverse here; BN running stats come from ``state``.

    ``check=True`` (default) verifies no leaf was silently dropped by
    round-tripping the emitted dict through ``from_torch`` and comparing
    leaf paths — unhandled layer classes raise instead of emitting an
    incomplete state_dict."""
    import numpy as _np
    flatten_info = flatten_info or {}
    state = state or {}
    out = {}

    def put(key, arr):
        out[key] = _np.asarray(arr)

    def oihw(w):
        return np.transpose(np.asarray(w), (3, 2, 0, 1))

    def rec(layer, params, state, prefix):
        if isinstance(layer, Conv2d):
            put(_join(prefix, "weight"), oihw(params["weight"]))
            if layer.use_bias and "bias" in params:
                put(_join(prefix, "bias"), params["bias"])
            return
        if isinstance(layer, Linear):
            w = np.asarray(params["weight"])
            if prefix in flatten_info:
                h, wd, c = flatten_info[prefix]
                o = w.shape[1]
                w = w.reshape(h, wd, c, o).transpose(3, 2, 0, 1)
                w = w.reshape(o, c * h * wd)
            else:
                w = w.T
            put(_join(prefix, "weight"), w)
            if layer.use_bias and "bias" in params:
                put(_join(prefix, "bias"), params["bias"])
            return
        if isinstance(layer, BatchNorm):
            if layer.affine:
                put(_join(prefix, "weight"), params["weight"])
                put(_join(prefix, "bias"), params["bias"])
            if state:
                put(_join(prefix, "running_mean"), state["mean"])
                put(_join(prefix, "running_var"), state["var"])
                put(_join(prefix, "num_batches_tracked"),
                    _np.asarray(0, dtype=_np.int64))
            return
        if isinstance(layer, PReLU):
            put(_join(prefix, "weight"), params["weight"])
            return
        if isinstance(layer, (ada.FullyConnectedLayer, sg2.EqualLinear)):
            put(_join(prefix, "weight"), params["weight"])
            if "bias" in params:
                put(_join(prefix, "bias"), params["bias"])
            return
        if isinstance(layer, (ada.SynthesisLayer, ada.SynthesisLayer1)):
            rec_children(layer, params, state, prefix,
                         skip=("weight", "bias", "noise_strength"))
            put(_join(prefix, "weight"), oihw(params["weight"]))
            for name in ("bias", "noise_strength"):
                if name in params:
                    put(_join(prefix, name), params[name])
            if "noise_const" in state:
                put(_join(prefix, "noise_const"), state["noise_const"])
            return
        if isinstance(layer, (ada.ToRGBLayer, ada.ToRGBLayer1)):
            rec_children(layer, params, state, prefix,
                         skip=("weight", "bias"))
            put(_join(prefix, "weight"), oihw(params["weight"]))
            if "bias" in params:
                put(_join(prefix, "bias"), params["bias"])
            return
        if isinstance(layer, (ada.EqualizedConv2d, sg2.EqualConv2d)):
            put(_join(prefix, "weight"), oihw(params["weight"]))
            if layer.bias and "bias" in params:
                put(_join(prefix, "bias"), params["bias"])
            return
        if isinstance(layer, ada.SynthesisPrologue):
            rec_children(layer, params, state, prefix, skip=("const",))
            put(_join(prefix, "const"),
                np.transpose(np.asarray(params["const"]), (2, 0, 1)))
            return
        if isinstance(layer, ada.MappingNetwork):
            rec_children(layer, params, state, prefix)
            if "w_avg" in state:
                put(_join(prefix, "w_avg"), state["w_avg"])
            return
        if isinstance(layer, sg2.ModulatedConv2d):
            rec_children(layer, params, state, prefix, skip=("weight",))
            put(_join(prefix, "weight"), oihw(params["weight"])[None])
            return
        if isinstance(layer, sg2.NoiseInjection):
            put(_join(prefix, "weight"), params["weight"])
            return
        if isinstance(layer, sg2.StyledConv):
            rec_children(layer, params, state, prefix, skip=("activate",))
            put(_join(prefix, "activate.bias"),
                params["activate"]["bias"])
            return
        if isinstance(layer, sg2.ToRGB):
            rec_children(layer, params, state, prefix, skip=("bias",))
            put(_join(prefix, "bias"),
                np.asarray(params["bias"]).reshape(1, 3, 1, 1))
            return
        if isinstance(layer, sg2.ConvLayer):
            act_idx = 2 if layer.downsample else 1
            rec_children(layer, params, state, prefix,
                         skip=(str(act_idx),) if layer.activate else ())
            if layer.activate and layer.bias:
                put(_join(prefix, f"{act_idx}.bias"),
                    params[str(act_idx)]["bias"])
            return
        if isinstance(layer, sg2.Generator):
            rec_children(layer, params, state, prefix,
                         skip=("input", "noises"))
            put(_join(prefix, "input.input"),
                np.transpose(np.asarray(params["input"]["input"]),
                             (0, 3, 1, 2)))
            for name, nz in state.get("noises", {}).items():
                put(_join(prefix, f"noises.{name}"),
                    np.transpose(np.asarray(nz), (0, 3, 1, 2)))
            return
        from ..models import efficientnet as effnet
        if isinstance(layer, effnet.SamePadConv):
            put(_join(prefix, "weight"), oihw(params["weight"]))
            if layer.bias and "bias" in params:
                put(_join(prefix, "bias"), params["bias"])
            return
        # generic container
        rec_children(layer, params, state, prefix)

    def rec_children(layer, params, state, prefix, skip=()):
        for name, child in iter_children(layer).items():
            if name in skip:
                continue
            rec(child, params.get(name, {}), state.get(name, {}),
                _join(prefix, name))

    rec(layer, params, state, prefix)

    if check:
        p2, s2 = from_torch(layer, out, prefix=prefix,
                            flatten_info=flatten_info, strict=False)
        missing = sorted(
            [".".join(p) for p in _leaf_paths(params) - _leaf_paths(p2)] +
            [".".join(p) for p in (_leaf_paths(state) - _leaf_paths(s2))
             if p[-1] not in _OUT_OF_BAND_STATE])
        if missing:
            raise ValueError(
                "to_torch would silently drop "
                f"{len(missing)} leaves (unhandled layer class?): "
                f"{missing[:20]}")
    return out


def head_params_from_torch(sd: Mapping[str, "object"]) -> dict:
    """Margin-head weights: torch (C, D) == our 'oi' layout, no transpose;
    Am_softmax ``kernel`` is (D, C), also kept as-is."""
    out = {}
    for k in ("weight", "bias", "kernel"):
        if k in sd:
            out[k] = jnp.asarray(_np(sd[k]))
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Thin wrapper to load a torch .pt/.pth on CPU (torch is a host-side
    dependency only; nothing torch touches the TPU)."""
    import torch
    return torch.load(path, map_location="cpu")
