"""Observability: metric aggregation, experiment logging, profiling.

Replaces the reference's scattered wandb/TensorBoard/tqdm usage
(SURVEY.md §5 / L8): wandb init + metric definitions (``train.py:101-107``),
`AverageMeter` (``util/utils.py``), `buffer_val` per-benchmark logging
(``util/utils.py:310-322``), the stage-2 coaches' loss-dict aggregation
(``utils/train_utils.py:2-13``), plus jax.profiler trace hooks the
reference never had.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional


class AverageMeter:
    """``util/utils.py`` AverageMeter parity."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def aggregate_loss_dicts(agg_list: List[Dict]) -> Dict[str, float]:
    """``restyle-encoder/utils/train_utils.py:2-13``: mean per key."""
    acc = defaultdict(list)
    for d in agg_list:
        for k, v in d.items():
            acc[k].append(float(v))
    return {k: sum(v) / len(v) for k, v in acc.items()}


class MetricLogger:
    """Experiment logger: console + JSONL file, optional wandb/TensorBoard
    backends when importable. API mirrors how the reference logs:
    ``log(step, dict)`` every N batches and ``log_benchmark`` per-epoch
    accuracy/threshold pairs (``buffer_val``)."""

    def __init__(self, log_dir: Optional[str] = None,
                 project: Optional[str] = None, use_wandb: bool = False,
                 name: Optional[str] = None):
        self.log_dir = log_dir
        self._file = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=project or "stylegan_for_facerec_tpu",
                           name=name)
            except Exception as e:  # offline container: degrade gracefully
                print(f"[logging] wandb unavailable ({e}); file/console "
                      f"logging only")
        self.meters: Dict[str, AverageMeter] = defaultdict(AverageMeter)

    def update_meters(self, metrics: Dict, n: int = 1):
        for k, v in metrics.items():
            self.meters[k].update(float(v), n)

    def log(self, step: int, metrics: Dict, prefix: str = ""):
        payload = {f"{prefix}{k}": float(v) for k, v in metrics.items()}
        payload["step"] = int(step)
        payload["time"] = time.time()
        if self._file:
            self._file.write(json.dumps(payload) + "\n")
            self._file.flush()
        if self._wandb:
            self._wandb.log(payload, step=int(step))
        line = " ".join(f"{k} {v:.5g}" for k, v in payload.items()
                        if k not in ("step", "time"))
        print(f"[step {step}] {line}")

    def log_benchmark(self, step: int, db_name: str, acc: float,
                      best_threshold: float, epoch: Optional[int] = None,
                      roc=None):
        """``buffer_val`` parity (``util/utils.py:310-322``). ``roc`` is an
        optional (tpr, fpr) pair; when given, the ROC curve is rendered and
        logged as an image artifact — the reference's ``gen_plot`` +
        roc_curve_tensor path (``util/utils.py:239-251,303-305``)."""
        payload = {f"{db_name}_Accuracy": acc,
                   f"{db_name}_Best_Threshold": best_threshold}
        if epoch is not None:
            payload["epoch"] = epoch
        self.log(step, payload)
        if roc is not None:
            tpr, fpr = roc
            self.log_image(f"{db_name}_ROC_Curve",
                           render_roc_curve(fpr, tpr), step)

    def log_image(self, name: str, image, step: int,
                  subscript: Optional[str] = None) -> Optional[str]:
        """Save an image artifact under ``log_dir/<name>/`` (the stage-2
        coaches' ``log_images`` layout, ``coach_restyle_psp.py:366-378``)
        and forward to wandb when enabled. ``image``: uint8 HWC array or
        PIL image. Returns the written path (None without a log_dir)."""
        import numpy as np
        from PIL import Image
        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image))
        path = None
        if self.log_dir:
            fname = (f"{subscript}_{step:04d}.jpg" if subscript
                     else f"{step:04d}.jpg")
            path = os.path.join(self.log_dir, name, fname)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            image.save(path)
        if self._wandb:
            self._wandb.log({name: self._wandb.Image(image)},
                            step=int(step))
        return path

    def close(self):
        if self._file:
            self._file.close()
        if self._wandb:
            self._wandb.finish()


def render_roc_curve(fpr, tpr):
    """ROC plot -> uint8 HWC image (``util/utils.py:239-251`` ``gen_plot``
    without the PIL/tensor round-trip)."""
    import numpy as np
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure()
    try:
        plt.xlabel("FPR", fontsize=14)
        plt.ylabel("TPR", fontsize=14)
        plt.title("ROC Curve", fontsize=14)
        plt.plot(np.asarray(fpr), np.asarray(tpr), linewidth=2)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        return buf.copy()
    finally:
        plt.close(fig)


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context — perfetto/tensorboard-consumable traces
    for the hot loop (the rebuild's answer to SURVEY §5 'tracing: none')."""
    if not enabled:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with EMA, for throughput reporting."""

    def __init__(self, beta: float = 0.9):
        self.beta = beta
        self.ema = None
        self._t = None

    def tic(self):
        self._t = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t
        self.ema = dt if self.ema is None else \
            self.beta * self.ema + (1 - self.beta) * dt
        return dt
