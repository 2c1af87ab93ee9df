"""Post-training int8 quantization for serving (TPU-native).

The v5e/v5p MXU runs int8 x int8 -> int32 at twice the bf16 rate, so a
quantized embedder doubles the serving throughput ceiling of the
compute-bound extractor paths (``eval/inference.py``,
``test_RFW.py``-style TTA sweeps). The reference has no quantized
serving story at all — this is a beyond-parity capability.

Design: zero model changes. ``nn.Ctx`` carries an optional ``quant``
hook that ``nn.Conv2d`` / ``nn.Linear`` delegate their compute to; hook
calls are identified by trace-time call ORDER (deterministic for the
static graphs this framework builds — the same Python-side-counter idea
``Ctx.make_rng`` uses), so calibration, weight quantization, and int8
serving line up without naming any layer. Covered primitives: the
face-recognition zoo's ``nn.Conv2d``/``nn.Linear`` (IR/IR-SE, ResNet,
MobileFaceNet, heads-free embedding path) AND the StyleGAN2-ADA
style-modulated conv (``modconv`` hook — the scaled-activation
formulation in ``ops/modconv.py`` keeps the base weight static, so the
synthesis/inversion serving path quantizes too; demodulation stays
f32). Still out of scope: EfficientNet's SamePadConv and the
rosinality-family equalized ops.

Scheme: symmetric int8. Weights per-OUTPUT-CHANNEL scales (absmax/127
over the receptive field), activations per-tensor scales calibrated as
the running absmax over calibration batches. Accumulation in int32,
rescale in f32 — the standard TF-Lite/AQT recipe. BatchNorm, PReLU,
pooling and the residual adds stay in the activation dtype (VPU work,
not MXU-bound).

Usage::

    table = calibrate_and_quantize(model, params, state, batches)
    lean  = strip_quantized_weights(params, table)     # drop f32 conv weights
    fn    = jax.jit(lambda p, s, t, x: quantized_apply(model, p, s, x, t))
    emb, _ = fn(lean, state, table.entries, images)

``table.entries`` is a plain pytree (list of dicts of arrays): pass it
as a jit ARGUMENT (never close over it — see CLAUDE.md on embedded
literals vs the remote-compile helper).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..nn import Ctx


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _quantize_weight(w: jnp.ndarray, channel_axis: int):
    """Symmetric per-output-channel int8: returns (wq int8, scale f32)
    with scale shaped to broadcast over the output-channel axis."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    # squeeze to (c_out,) — the serving hook re-broadcasts on the last axis
    return wq, scale.reshape(-1).astype(jnp.float32)


def _quantize_act(x: jnp.ndarray, absmax: jnp.ndarray):
    scale = jnp.maximum(absmax.astype(jnp.float32), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                  -127, 127).astype(jnp.int8)
    return xq, scale


class _Recorder:
    """Calibration + weight-quantization hook (eager only): runs the
    normal f32 math so the forward proceeds, while recording per-call
    activation absmax (running max across batches) and, on the first
    batch, the quantized weights."""

    def __init__(self):
        self.entries: List[Dict[str, Any]] = []
        self.kinds: List[str] = []   # host-side, parallel to entries —
        # keeping it OUT of entries keeps entries a pure array pytree
        # (valid as a jit argument)
        self.weight_ids = set()
        self._i = 0
        self._first = True

    def begin_batch(self):
        self._first = not self.entries
        self._i = 0

    def _observe(self, layer, params, x, kind, channel_axis):
        if isinstance(x, jax.core.Tracer):
            raise ValueError(
                "calibrate_and_quantize must run OUTSIDE jit: the "
                "recorder stores concrete absmax values at call time")
        i = self._i
        self._i += 1
        absmax = jnp.max(jnp.abs(x)).astype(jnp.float32)
        if self._first:
            wq, w_scale = _quantize_weight(
                params["weight"].astype(jnp.float32), channel_axis)
            self.entries.append({"w": wq, "w_scale": w_scale,
                                 "x_absmax": absmax})
            self.kinds.append(kind)
            self.weight_ids.add(id(params["weight"]))
        else:
            if i >= len(self.entries) or self.kinds[i] != kind:
                raise ValueError(
                    f"call order diverged between calibration batches at "
                    f"call {i} ({kind}); the model's conv/linear call "
                    f"sequence must be static")
            e = self.entries[i]
            e["x_absmax"] = jnp.maximum(e["x_absmax"], absmax)
        # run the ordinary compute so downstream layers see exact f32
        return layer.apply(params, {}, x, Ctx(train=False))[0]

    def conv2d(self, layer, params, x):
        return self._observe(layer, params, x, "conv2d", channel_axis=3)

    def linear(self, layer, params, x):
        return self._observe(layer, params, x, "linear", channel_axis=1)

    def modconv(self, params, x, styles, padding: int, demodulate: bool):
        """Style-modulated conv (``ops/modconv.py`` scaled-activation
        form): the base HWIO weight is STATIC, so it quantizes exactly
        like a plain conv; the per-sample style modulation lands on the
        activation side (x * styles) and is covered by the calibrated
        per-tensor activation scale. Demodulation coefficients need
        sum_k weight^2 — recorded once as f32 ``w_sq`` (I, O) so the f32
        weight itself can still be stripped from the serving tree."""
        from ..ops.modconv import modulated_conv2d

        x_mod = x * styles[:, None, None, :].astype(x.dtype)
        if isinstance(x_mod, jax.core.Tracer):
            raise ValueError(
                "calibrate_and_quantize must run OUTSIDE jit: the "
                "recorder stores concrete absmax values at call time")
        i = self._i
        self._i += 1
        absmax = jnp.max(jnp.abs(x_mod)).astype(jnp.float32)
        if self._first:
            w = params["weight"].astype(jnp.float32)
            wq, w_scale = _quantize_weight(w, channel_axis=3)
            entry = {"w": wq, "w_scale": w_scale, "x_absmax": absmax}
            if demodulate:
                entry["w_sq"] = jnp.sum(jnp.square(w), axis=(0, 1))
            self.entries.append(entry)
            self.kinds.append("modconv")
            self.weight_ids.add(id(params["weight"]))
        else:
            if i >= len(self.entries) or self.kinds[i] != "modconv":
                raise ValueError(
                    f"call order diverged between calibration batches at "
                    f"call {i} (modconv); the model's conv/linear call "
                    f"sequence must be static")
            e = self.entries[i]
            e["x_absmax"] = jnp.maximum(e["x_absmax"], absmax)
        return modulated_conv2d(x, params["weight"].astype(x.dtype),
                                styles, padding=padding,
                                demodulate=demodulate)


class Int8Apply:
    """Serving hook: per call i, quantize the activation with the
    calibrated static scale and run int8 x int8 -> int32 on the MXU."""

    def __init__(self, entries: Sequence[Dict[str, Any]]):
        self.entries = entries
        self._i = 0

    def _take(self, kind):
        i = self._i
        self._i += 1
        if i >= len(self.entries):
            raise ValueError(
                f"quantized table has {len(self.entries)} entries but the "
                f"model issued call {i} ({kind}); re-run "
                f"calibrate_and_quantize for this model configuration")
        return self.entries[i]

    def conv2d(self, layer, params, x):
        e = self._take("conv2d")
        xq, x_scale = _quantize_act(x, e["x_absmax"])
        ph, pw = _pair(layer.padding)
        y = lax.conv_general_dilated(
            xq, e["w"],
            window_strides=_pair(layer.stride),
            padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=layer.groups,
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (x_scale * e["w_scale"])
        if layer.use_bias:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(x.dtype)

    def linear(self, layer, params, x):
        e = self._take("linear")
        xq, x_scale = _quantize_act(x, e["x_absmax"])
        y = lax.dot_general(xq, e["w"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (x_scale * e["w_scale"])
        if layer.use_bias:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(x.dtype)

    def modconv(self, params, x, styles, padding: int, demodulate: bool):
        """int8 modulated conv: quantize the style-modulated activations
        with the calibrated static scale, conv against the static int8
        base weight, rescale, then demodulate in f32 (same eps placement
        as ``ops/modconv.py``)."""
        e = self._take("modconv")
        x_mod = x * styles[:, None, None, :].astype(x.dtype)
        xq, x_scale = _quantize_act(x_mod, e["x_absmax"])
        y = lax.conv_general_dilated(
            xq, e["w"], (1, 1), [(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (x_scale * e["w_scale"])
        if demodulate:
            ssq = jnp.square(styles.astype(jnp.float32))
            dcoefs = lax.rsqrt(ssq @ e["w_sq"] + 1e-8)
            y = y * dcoefs[:, None, None, :]
        return y.astype(x.dtype)


@dataclasses.dataclass
class Int8Table:
    """Calibrated quantization artifact. ``entries`` is a jit-friendly
    pytree; ``weight_ids`` (host-only) lets ``strip_quantized_weights``
    drop the now-redundant f32 weights from the serving param tree."""

    entries: List[Dict[str, Any]]
    weight_ids: set

    def nbytes(self) -> int:
        return sum(int(e["w"].size) for e in self.entries)


def calibrate_and_quantize(layer, params, state, batches,
                           ctx_kwargs: Optional[dict] = None,
                           apply_kwargs: Optional[dict] = None) -> Int8Table:
    """Run eager forwards over ``batches`` (an iterable of model inputs),
    recording per-call activation absmax and per-output-channel int8
    weights. More/wider calibration batches -> tighter activation
    ranges; the running-max rule means order does not matter.
    ``apply_kwargs`` forwards extra apply arguments (e.g. the generator's
    ``noise_mode='const'`` so calibration and serving see the same
    noise)."""
    rec = _Recorder()
    n = 0
    for x in batches:
        rec.begin_batch()
        ctx = Ctx(train=False, quant=rec, **(ctx_kwargs or {}))
        layer.apply(params, state, x, ctx, **(apply_kwargs or {}))
        n += 1
    if n == 0 or not rec.entries:
        raise ValueError("calibration needs >=1 batch and a model with "
                         ">=1 nn.Conv2d/nn.Linear call")
    return Int8Table(entries=rec.entries, weight_ids=rec.weight_ids)


def calibrate_with(forward, batches) -> Int8Table:
    """Generic calibration for model surfaces that are not a single
    ``layer.apply`` — e.g. the iterative-refinement inversion loop
    (``eval/inference.run_on_batch``), whose 5 iterations each issue
    their own hooked calls. ``forward(x, hook)`` must run the full
    (eager) computation with ``hook`` installed as ``Ctx.quant`` in
    every model invocation."""
    rec = _Recorder()
    n = 0
    for x in batches:
        rec.begin_batch()
        forward(x, rec)
        n += 1
    if n == 0 or not rec.entries:
        raise ValueError("calibration needs >=1 batch and >=1 hooked call")
    return Int8Table(entries=rec.entries, weight_ids=rec.weight_ids)


def strip_quantized_weights(params, table: Int8Table):
    """Return a copy of ``params`` with every quantized f32 weight
    replaced by a 0-d int8 placeholder (the serving hook never reads
    them). IR-SE-50 drops ~166 MB -> ~42 MB of weight HBM."""
    placeholder = jnp.zeros((), jnp.int8)

    def walk(t):
        if isinstance(t, dict):
            return {k: walk(v) for k, v in t.items()}
        return placeholder if id(t) in table.weight_ids else t

    return walk(params)


def quantized_apply(layer, params, state, x, entries,
                    ctx_kwargs: Optional[dict] = None, **apply_kwargs):
    """Jittable int8 forward: ``entries`` must be ``table.entries``
    passed as an argument (fresh hook per trace, so the call counter
    always starts at 0). ``**apply_kwargs`` forwards to ``layer.apply``
    (e.g. ``noise_mode='const'`` for generators)."""
    ctx = Ctx(train=False, quant=Int8Apply(entries), **(ctx_kwargs or {}))
    return layer.apply(params, state, x, ctx, **apply_kwargs)
