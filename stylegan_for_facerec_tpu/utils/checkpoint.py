"""Checkpoint IO: save/restore arbitrary JAX pytrees.

Replaces the reference's per-epoch ``torch.save`` of backbone/head/
optimizer state_dicts (``train.py:412-421``) and the stage-2 coach's
``{state_dict, opts, latent_avg}`` bundles
(``coach_restyle_psp.py:259-268,380-393``), including resume
(``train.py:206-232``).

Formats (selected by ``backend=``, recorded in the manifest):
  * ``npz`` (default): ``manifest.json`` (tree structure + metadata) and
    one ``.npz`` holding all leaves — dependency-free and fast for
    single-host trees.
  * ``orbax``: leaves stored through ``orbax.checkpoint`` — use for
    sharded ``jax.Array`` trees on a multi-chip mesh, where each host
    writes only its shards instead of gathering everything to one
    process. Structure/metadata handling is shared with the npz path, so
    the two are interchangeable at load time.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax


def save_checkpoint(path: str, tree: Any,
                    metadata: Optional[Dict] = None,
                    backend: str = "npz") -> None:
    os.makedirs(path, exist_ok=True)
    # named-tuple-heavy optax states serialize via jax flattening
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if backend == "orbax":
        import shutil
        import orbax.checkpoint as ocp
        d = os.path.join(os.path.abspath(path), "orbax")
        if os.path.exists(d):
            shutil.rmtree(d)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(d, {f"leaf_{i}": l for i, l in enumerate(leaves)})
    else:
        for l in leaves:
            if isinstance(l, jax.Array) and not l.is_fully_addressable:
                raise ValueError(
                    "npz checkpointing cannot serialize non-fully-"
                    "addressable (multi-process) arrays — pass "
                    "backend='orbax', which writes each host's shards")
        np.savez(os.path.join(path, "leaves.npz"),
                 **{f"leaf_{i}": np.asarray(l)
                    for i, l in enumerate(leaves)})
    # pickle the treedef FIRST so the manifest can record whether a
    # template-free load will work; a silently-missing treedef.pkl used to
    # surface only as a FileNotFoundError at resume time (ADVICE r3 #4)
    import pickle
    try:
        treedef_blob = pickle.dumps(treedef)
    except Exception as e:  # noqa: BLE001 — degraded but loadable w/ like=
        treedef_blob = None
        import sys
        print(f"[checkpoint] WARNING: treedef for {path} is not "
              f"picklable ({e!r}); this checkpoint will only load with "
              f"an explicit like= template", file=sys.stderr)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"treedef": str(treedef),
                   "n_leaves": len(leaves),
                   "backend": backend,
                   "treedef_pickled": treedef_blob is not None,
                   "metadata": metadata or {}}, f)
    if treedef_blob is not None:
        with open(os.path.join(path, "treedef.pkl"), "wb") as f:
            f.write(treedef_blob)


def resolve_checkpoint_dir(path: str) -> str:
    """Accept either a concrete checkpoint dir or a CheckpointManager root
    (resolves to its latest ``step_*``/``best``) — so a user can point the
    eval CLIs straight at a training run's output directory."""
    if os.path.exists(os.path.join(path, "manifest.json")):
        return path
    if os.path.isdir(path):
        steps = sorted(d for d in os.listdir(path)
                       if d.startswith("step_"))
        if steps:
            return os.path.join(path, steps[-1])
        if os.path.exists(os.path.join(path, "best", "manifest.json")):
            return os.path.join(path, "best")
    return path


def load_checkpoint(path: str, like: Any = None) -> Any:
    """Restore a pytree. If ``like`` (a template pytree with the same
    structure) is given, restore into its structure; otherwise use the
    pickled treedef. ``path`` may be a manager root (latest step used)."""
    path = resolve_checkpoint_dir(path)
    backend = "npz"
    manifest = os.path.join(path, "manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            backend = json.load(f).get("backend", "npz")
    if backend == "orbax":
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            data = ckptr.restore(os.path.join(os.path.abspath(path),
                                              "orbax"))
        leaves = [data[f"leaf_{i}"] for i in range(len(data))]
    else:
        data = np.load(os.path.join(path, "leaves.npz"))
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
    else:
        import pickle
        tdp = os.path.join(path, "treedef.pkl")
        if not os.path.exists(tdp):
            raise RuntimeError(
                f"{path} has no treedef.pkl (it was not picklable at "
                f"save time — see manifest 'treedef_pickled'); pass "
                f"like=<template pytree with the same structure> to "
                f"load_checkpoint")
        try:
            with open(tdp, "rb") as f:
                treedef = pickle.load(f)
        except Exception as e:  # noqa: BLE001 — jax version drift etc.
            raise RuntimeError(
                f"{path}/treedef.pkl failed to unpickle ({e!r}) — a jax "
                f"version change can break treedef pickles; pass "
                f"like=<template pytree> to load_checkpoint") from e
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_metadata(path: str) -> Dict:
    with open(os.path.join(resolve_checkpoint_dir(path),
                           "manifest.json")) as f:
        return json.load(f).get("metadata", {})


def load_generator_handoff(path: str, decoder_def, want_params,
                           want_state):
    """Resolve a stage-2 CLI ``--stylegan_weights`` argument: either a
    NATIVE stage-1 run directory (``tools/train_stage1.py`` saves
    ``{"g_ema", "g_state"}``) or a torch ADA-lightning checkpoint
    (``G.*`` keys — the reference's handoff,
    ``restyle-encoder/models/psp.py:67-77``).

    Returns ``(decoder_params, decoder_state, source_label)``;
    ``want_params``/``want_state`` are the freshly-initialized decoder
    trees (used for a structure check on the native path, and as the
    state fallback when the run predates g_state saving).
    """
    if os.path.isdir(path):
        ckpt = load_checkpoint(path)
        if not (isinstance(ckpt, dict) and "g_ema" in ckpt):
            raise SystemExit(
                f"{path} is a checkpoint dir but has no 'g_ema' entry — "
                f"expected a tools/train_stage1.py run dir")
        p = ckpt["g_ema"]
        s = ckpt.get("g_state", want_state)
        want = jax.tree_util.tree_structure(want_params)
        got = jax.tree_util.tree_structure(p)
        if want != got:
            raise SystemExit(
                "stage-1 g_ema tree does not match this coach's decoder "
                "(different image_size/z_dim/mapping depth?)")
        return p, s, "native stage-1 run dir"
    from .torch_convert import from_torch, load_torch_checkpoint
    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("state_dict", ckpt)
    g_sd = {k[2:]: v for k, v in sd.items() if k.startswith("G.")}
    p, s = from_torch(decoder_def, g_sd, strict=False)
    return p, s, "torch ADA checkpoint"


class CheckpointManager:
    """Epoch/step-indexed manager with best-metric tracking — the stage-2
    coach's best_model/iteration_N pattern and stage 3's timestamped
    per-epoch saves."""

    def __init__(self, root: str, keep: int = 5, backend: str = "npz"):
        self.root = root
        self.keep = keep
        self.backend = backend
        os.makedirs(root, exist_ok=True)
        # recover the best metric from an existing best/ checkpoint so a
        # resumed run cannot clobber it with a worse model
        self.best: Optional[float] = None
        best_manifest = os.path.join(root, "best", "manifest.json")
        if os.path.exists(best_manifest):
            try:
                with open(best_manifest) as f:
                    meta = json.load(f).get("metadata", {})
                self.best = meta.get("metric")
            except (json.JSONDecodeError, OSError):
                pass

    def step_path(self, step: int) -> str:
        return os.path.join(self.root, f"step_{step:09d}")

    def save(self, step: int, tree: Any, metric: Optional[float] = None,
             metadata: Optional[Dict] = None) -> str:
        meta = dict(metadata or {})
        meta["step"] = step
        if metric is not None:
            meta["metric"] = metric
        p = self.step_path(step)
        save_checkpoint(p, tree, meta, backend=self.backend)
        if metric is not None and (self.best is None or metric < self.best):
            self.best = metric
            save_checkpoint(os.path.join(self.root, "best"), tree, meta,
                            backend=self.backend)
        self._gc()
        return p

    def latest(self) -> Optional[str]:
        steps = sorted(d for d in os.listdir(self.root)
                       if d.startswith("step_"))
        return os.path.join(self.root, steps[-1]) if steps else None

    def _gc(self):
        steps = sorted(d for d in os.listdir(self.root)
                       if d.startswith("step_"))
        for d in steps[: -self.keep]:
            import shutil
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
