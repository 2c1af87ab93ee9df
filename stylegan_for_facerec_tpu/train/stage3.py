"""Stage-3 face-recognition trainer (the reference's main entry point,
``/root/reference/train.py:21-421``), rebuilt as a single jitted SPMD train
step over a (data, model) mesh.

Maps the reference's pieces onto TPU idioms:
  * DataParallel scatter/gather (``train.py:219-222``) -> batch sharded
    over the 'data' mesh axis; gradient all-reduce inserted by XLA.
  * Hand-chunked model-parallel head (``head/metrics.py:104-113``) ->
    head weight sharded (class dim) over 'model'; the margin + focal-CE
    runs on the ('data','model') logit block layout, with cross-shard
    max/sum collectives generated from the sharding annotations.
  * warmup + /1.5 stage LR decay (``util/utils.py:184-196``) -> Stage3Schedule.
  * frozen-backbone epochs (``train.py:263-274``) -> gradient masks.
  * BatchNorm running stats + SGD momentum -> explicit state threaded
    through the step (no hidden mutation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..losses.focal import focal_loss, softmax_cross_entropy, topk_accuracy
from ..models.heads import arcface_margin, cosface_margin
from ..nn import Ctx, Layer
from ..parallel import mesh as mesh_lib
from . import optim


@dataclasses.dataclass(frozen=True)
class Stage3Config:
    """Mirrors ``configs/config_BUPT_IR_50_AfrAsian.py:7-56``."""

    emb_size: int = 512
    num_classes: int = 28000
    head: str = "ArcFace"            # train.py:178-181 HEAD_DICT
    loss: str = "Focal"              # train.py:183-186 LOSS_DICT
    arcface_s: float = 64.0
    margin: float = 0.50
    lr: float = 0.03
    momentum: float = 0.9
    weight_decay: float = 2e-3
    batch_size: int = 100
    num_epochs: int = 100
    # config_BUPT_IR_50_AfrAsian.py:45: STAGES = [10,15,...,120] + 5
    stages: Sequence[int] = tuple(range(15, 130, 5))
    warmup_batches: int = 0
    freeze_backbone_epochs: int = 3
    sync_bn: bool = False
    # BN-under-SPMD semantics (SURVEY §7 hard-part 4, docs/PARITY.md):
    #   sync_bn=True  -> whole-global-batch statistics (the natural pjit
    #                    behavior: XLA all-reduces the batch moments).
    #   sync_bn=False -> per-replica statistics like the reference's
    #                    DataParallel BN (train.py:219-222), emulated with
    #                    ghost BN over bn_groups groups; on a mesh the
    #                    group count defaults to the 'data' axis size so
    #                    group == device shard and no collectives appear.
    bn_groups: Optional[int] = None  # explicit override (tests/single-dev)
    compute_dtype: str = "bfloat16"  # backbone compute dtype (repo
    # invariant: bf16 compute + f32 params). Params/optimizer/BN
    # statistics/margin+loss math stay float32 regardless — matching the
    # reference's f32 margin math (head/metrics.py:97-140). Set 'float32'
    # for exact-parity comparisons.
    remat: bool = False              # jax.checkpoint the backbone forward
    # (rematerialize activations in backward: trades ~1/3 more FLOPs for
    # activation memory, enabling much larger per-chip batches)
    augment_crop: Optional[int] = None
    # when set, RandomCrop(augment_crop) + RandomHorizontalFlip run INSIDE
    # the jitted train step (train.py:109-117 transform tail) — one
    # dispatch per batch instead of separate eager augment calls, and the
    # uncropped batch never round-trips HBM


class Stage3Trainer:
    """Builds the jitted train/eval steps for (backbone, head) Layer pair.

    The backbone maps images -> (B, emb) embeddings; the head owns a
    (num_classes, emb) weight. ``margin_fn(cosine, one_hot)`` applies the
    margin on the (possibly sharded) cosine block.
    """

    def __init__(self, backbone: Layer, cfg: Stage3Config,
                 mesh: Optional[Mesh] = None,
                 steps_per_epoch: int = 1000):
        self.backbone = backbone
        self.cfg = cfg
        self.mesh = mesh
        if cfg.bn_groups is not None:
            self.bn_groups = cfg.bn_groups
        elif mesh is not None and not cfg.sync_bn:
            self.bn_groups = int(mesh.shape.get("data", 1))
        else:
            self.bn_groups = None
        self.schedule = optim.Stage3Schedule(
            base_lr=cfg.lr, warmup_batches=cfg.warmup_batches,
            steps_per_epoch=steps_per_epoch, stages=tuple(cfg.stages))
        self.decay_mask_fn = optim.batchnorm_decay_mask(backbone)
        # weight decay is applied OUTSIDE the optax chain (in _train_step,
        # via add_decayed_weights_masked) so the freeze mask can zero it:
        # a frozen param must receive no update at all, decay included
        self.tx = optim.sgd_torch(self.schedule, momentum=cfg.momentum,
                                  weight_decay=0.0)
        # donate params/state/opt_state: the step returns their successors,
        # so XLA can update in place instead of allocating fresh HBM copies
        self._jit_train_step = jax.jit(self._train_step,
                                       donate_argnums=(0, 1, 2))
        self._jit_eval_step = jax.jit(self._embed_step)

    # -- params ------------------------------------------------------------

    def init(self, key: jax.Array):
        kb, kh = jax.random.split(key)
        b_params, b_state = self.backbone.init(kb)
        head_w = jax.nn.initializers.glorot_uniform()(
            kh, (self.cfg.num_classes, self.cfg.emb_size), jnp.float32)
        params = {"backbone": b_params, "head": {"weight": head_w}}
        state = {"backbone": b_state}
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            params = mesh_lib.shard_params(self.mesh, params)
            state = jax.device_put(state, mesh_lib.replicated(self.mesh))
            # momentum buffers mirror param paths, so the same placement rule
            # class-shards the head-weight momentum too
            opt_state = mesh_lib.shard_params(self.mesh, opt_state)
        return params, state, opt_state

    def _full_decay_mask(self, params):
        return {"backbone": self.decay_mask_fn(params["backbone"]),
                "head": jax.tree_util.tree_map(lambda _: True,
                                               params["head"])}

    # -- math --------------------------------------------------------------

    def _margin_logits(self, head_w, features, labels):
        cfg = self.cfg
        f = features / jnp.maximum(
            jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
        w = head_w / jnp.maximum(
            jnp.linalg.norm(head_w, axis=-1, keepdims=True), 1e-12)
        if self.cfg.compute_dtype == "bfloat16":
            # normalize in f32, feed the MXU bf16 operands with f32
            # accumulation: ~4x the f32 matmul throughput on v5e while the
            # margin math below stays f32 (head/metrics.py:97-140)
            f = f.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
        cosine = jnp.dot(f, w.T, preferred_element_type=jnp.float32)
        if self.mesh is not None:
            cosine = jax.lax.with_sharding_constraint(
                cosine, mesh_lib.logits_sharding(self.mesh))
        one_hot = jax.nn.one_hot(labels, cfg.num_classes,
                                 dtype=cosine.dtype)
        if cfg.head == "ArcFace":
            return arcface_margin(cosine, one_hot, cfg.arcface_s, cfg.margin)
        if cfg.head == "CosFace":
            return cosface_margin(cosine, one_hot, cfg.arcface_s, cfg.margin)
        if cfg.head == "Softmax":
            return cosine * cfg.arcface_s
        raise ValueError(cfg.head)

    def _loss_fn(self, params, state, images, labels, rng):
        ctx = Ctx(train=True, rng=rng, bn_groups=self.bn_groups)
        if images.dtype == jnp.uint8:
            # packed-shard path (data/packed.py): uint8 ships host->device
            # 4x cheaper; x/127.5 - 1 == ToTensor + Normalize(0.5, 0.5)
            images = images.astype(jnp.float32) / 127.5 - 1.0
        b_params = params["backbone"]
        if self.cfg.compute_dtype == "bfloat16":
            from ..nn import cast_floats
            b_params = cast_floats(b_params, jnp.bfloat16)
            images = images.astype(jnp.bfloat16)
        def backbone_fwd(p, s, imgs):
            return self.backbone.apply(p, s, imgs, ctx)
        if self.cfg.remat:
            backbone_fwd = jax.checkpoint(backbone_fwd)
        features, new_bstate = backbone_fwd(b_params, state["backbone"],
                                            images)
        if self.cfg.compute_dtype == "bfloat16":
            # keep BN running stats in f32 regardless of compute dtype
            new_bstate = jax.tree_util.tree_map(
                lambda a, b: a.astype(b.dtype), new_bstate,
                state["backbone"])
        logits = self._margin_logits(params["head"]["weight"],
                                     features.astype(jnp.float32), labels)
        if self.cfg.loss == "Focal":
            loss = focal_loss(logits, labels)
        else:
            loss = softmax_cross_entropy(logits, labels)
        # prec@1/@5 as the reference's per-batch metrics (train.py:306-311)
        acc = topk_accuracy(logits, labels, 1)
        acc5 = topk_accuracy(logits, labels, 5)
        return loss, ({"backbone": new_bstate}, (acc, acc5))

    def _train_step(self, params, state, opt_state, images, labels, rng,
                    step, grad_mask):
        if self.cfg.augment_crop is not None:
            from ..ops.image import random_crop, random_hflip
            rng, k_crop, k_flip = jax.random.split(rng, 3)
            images = random_crop(k_crop, images, self.cfg.augment_crop)
            images = random_hflip(k_flip, images)
        (loss, (new_state, (acc, acc5))), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(params, state, images, labels, rng)
        grads = optim.add_decayed_weights_masked(
            grads, params, self.cfg.weight_decay,
            self._full_decay_mask(params), grad_mask)
        updates, new_opt_state = self.tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates)
        metrics = {"loss": loss, "top1": acc, "top5": acc5,
                   "lr": self.schedule(step)}
        return new_params, new_state, new_opt_state, metrics

    def _embed_step(self, params, state, images):
        ctx = Ctx(train=False)
        features, _ = self.backbone.apply(params["backbone"],
                                          state["backbone"], images, ctx)
        return features

    # -- public ------------------------------------------------------------

    def train_step(self, params, state, opt_state, images, labels, rng,
                   step, grad_mask=None):
        if self.mesh is not None:
            bs = mesh_lib.batch_sharding(self.mesh)
            images = jax.device_put(images, bs)
            labels = jax.device_put(labels, bs)
        return self._jit_train_step(params, state, opt_state, images,
                                    labels, rng, step, grad_mask)

    def embed(self, params, state, images):
        return self._jit_eval_step(params, state, images)

    def freeze_mask(self, params, frozen: bool):
        """Gradient mask freezing encoder body in the first
        FREEZE_BACKBONE_EPOCHS (train.py:263-274: input/output layers stay
        trainable)."""
        if not frozen:
            return jax.tree_util.tree_map(
                lambda _: jnp.ones((), jnp.float32), params)
        # freeze every backbone 'body' subtree (works for Backbone and
        # PSpFaceRec param layouts)
        prefixes = [("backbone", "body"),
                    ("backbone", "encoder", "body")]
        return optim.freeze_mask_for(None, prefixes, params)
