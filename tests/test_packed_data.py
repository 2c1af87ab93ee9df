"""Packed training shards + prefetch pipeline (VERDICT r2 next #1):
pack -> mmap-gather roundtrip, loader contract, device prefetch, uint8
normalization inside the train step, in-step augmentation, and a CLI
integration run asserting the stage-3 observability JSONL rows
(train.py:329-331,351-355 parity)."""

import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_for_facerec_tpu.data import (PackedLoader, PackedTrainDataset,
                                           FacesDataset, device_prefetch,
                                           is_packed_dir, pack_dataset)

REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_image_tree(root, n_ids=4, per_id=6, size=40):
    from PIL import Image
    rng = np.random.RandomState(3)
    for i in range(n_ids):
        d = os.path.join(root, f"m.{i:04d}")
        os.makedirs(d, exist_ok=True)
        for j in range(per_id):
            arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{j}.png"))


def _write_packed(root, n=64, size=32, n_ids=8, shard_size=24, seed=0):
    """Synthesize a packed dir directly (no decode step)."""
    from stylegan_for_facerec_tpu.data import write_packed
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 256, (n, size, size, 3), dtype=np.uint8)
    labels = rng.randint(0, n_ids, n).astype(np.int32)
    write_packed(root, images, labels,
                 id_list=[f"id{i}" for i in range(n_ids)],
                 shard_size=shard_size)
    return images, labels


def test_pack_roundtrip_matches_loader(tmp_path):
    """pack_dataset output must reproduce exactly what the training loader
    would have decoded (uint8 inverse of the float [-1,1] pipeline)."""
    tree = tmp_path / "imgs"
    _write_image_tree(str(tree), n_ids=3, per_id=4, size=36)
    ds = FacesDataset(str(tree), image_size=32)
    out = tmp_path / "packed"
    meta = pack_dataset(ds, str(out), shard_size=5, batch_size=4,
                        progress=False)
    assert meta["n_images"] == 12 and meta["n_shards"] == 3
    assert is_packed_dir(str(out))

    pds = PackedTrainDataset(str(out))
    assert pds.n_identities == 3
    assert pds.id_list == ds.id_list
    # labels follow dataset order
    want_labels = np.asarray([ds.label_of(i) for i in range(len(ds))])
    np.testing.assert_array_equal(pds.labels, want_labels)
    # packed uint8 must reproduce exactly what the training loader path
    # (native C++ when built, else python) would have fed the step:
    # uint8 == round((loader float [-1,1]) + 1) * 127.5
    from stylegan_for_facerec_tpu.data.native_loader import make_loader
    loader = make_loader(FacesDataset(str(tree), image_size=32), 4,
                         shuffle=False, drop_last=False)
    got = pds.gather(np.arange(len(ds)))
    i = 0
    for imgs_f, labs in loader:
        want = np.rint((imgs_f + 1.0) * 127.5).clip(0, 255) \
            .astype(np.uint8)
        np.testing.assert_array_equal(got[i:i + len(labs)], want)
        np.testing.assert_array_equal(pds.labels[i:i + len(labs)], labs)
        i += len(labs)
    assert i == len(ds)


def test_packed_gather_shard_grouping(tmp_path):
    images, labels = _write_packed(str(tmp_path / "p"), n=50, shard_size=7)
    pds = PackedTrainDataset(str(tmp_path / "p"))
    idxs = np.asarray([49, 0, 13, 7, 6, 48, 21, 21])
    np.testing.assert_array_equal(pds.gather(idxs), images[idxs])


def test_packed_loader_contract(tmp_path):
    images, labels = _write_packed(str(tmp_path / "p"), n=50, shard_size=16)
    pds = PackedTrainDataset(str(tmp_path / "p"))
    loader = PackedLoader(pds, batch_size=8, seed=5)
    assert len(loader) == 6  # drop_last
    seen = []
    for imgs, labs in loader:
        assert imgs.dtype == np.uint8 and imgs.shape == (8, 32, 32, 3)
        assert labs.dtype == np.int32
        # every (img, label) pair is a genuine dataset row
        for im, lb in zip(imgs, labs):
            hits = np.where((images == im).all(axis=(1, 2, 3)))[0]
            assert any(labels[h] == lb for h in hits)
        seen.append(labs)
    assert len(seen) == 6
    # same seed -> same epoch order; second epoch differs (reshuffle)
    l2 = PackedLoader(pds, batch_size=8, seed=5)
    np.testing.assert_array_equal(next(iter(l2))[1], seen[0])
    second_epoch = [labs for _, labs in loader]
    assert not all(np.array_equal(a, b)
                   for a, b in zip(seen, second_epoch))


def test_packed_loader_keeps_tail_when_not_dropping(tmp_path):
    _write_packed(str(tmp_path / "p"), n=20, shard_size=16)
    pds = PackedTrainDataset(str(tmp_path / "p"))
    loader = PackedLoader(pds, batch_size=8, drop_last=False, shuffle=False)
    sizes = [len(labs) for _, labs in loader]
    assert sizes == [8, 8, 4]


def test_packed_loader_propagates_gather_errors(tmp_path):
    _write_packed(str(tmp_path / "p"), n=20, shard_size=16)
    pds = PackedTrainDataset(str(tmp_path / "p"))

    def bad_gather(idxs):
        raise OSError("shard read failed")

    pds.gather = bad_gather
    loader = PackedLoader(pds, batch_size=8)
    with pytest.raises(RuntimeError, match="PackedLoader producer failed"):
        list(loader)


def test_device_prefetch_passthrough(tmp_path):
    batches = [(np.full((2, 4, 4, 3), i, np.uint8),
                np.asarray([i, i], np.int32)) for i in range(5)]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    for i, (imgs, labs) in enumerate(out):
        assert isinstance(imgs, jax.Array)
        np.testing.assert_array_equal(np.asarray(imgs), batches[i][0])
        np.testing.assert_array_equal(np.asarray(labs), batches[i][1])


def test_device_prefetch_propagates_errors():
    def bad():
        yield (np.zeros((1, 2, 2, 3), np.uint8), np.zeros(1, np.int32))
        raise ValueError("decode exploded")
    it = device_prefetch(bad(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="prefetch producer failed"):
        list(it)


def test_uint8_step_matches_float_step(rng):
    """uint8 images normalized inside the jitted step must give the same
    loss/updates as the float [-1,1] path (x/127.5 - 1 == ToTensor +
    Normalize(0.5,0.5))."""
    from test_train_stage3 import make_trainer
    u8 = rng.randint(0, 256, (16, 32, 32, 3)).astype(np.uint8)
    images_f = u8.astype(np.float32) / 127.5 - 1.0
    labels = jnp.asarray(rng.randint(0, 64, 16))

    t = make_trainer(freeze_backbone_epochs=0)
    p, s, o = t.init(jax.random.key(0))
    mask = t.freeze_mask(p, frozen=False)
    p1, _, _, m1 = t.train_step(p, s, o, jnp.asarray(images_f), labels,
                                jax.random.key(1),
                                jnp.zeros((), jnp.int32), mask)
    head1 = np.asarray(p1["head"]["weight"]).copy()

    t2 = make_trainer(freeze_backbone_epochs=0)
    p, s, o = t2.init(jax.random.key(0))
    p2, _, _, m2 = t2.train_step(p, s, o, jnp.asarray(u8), labels,
                                 jax.random.key(1),
                                 jnp.zeros((), jnp.int32), mask)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    # XLA fuses the in-step normalize differently from the host numpy
    # division: float-eps-level wiggle only
    np.testing.assert_allclose(head1, np.asarray(p2["head"]["weight"]),
                               rtol=1e-5, atol=1e-6)


def test_augment_crop_inside_step_matches_manual(rng):
    """cfg.augment_crop folds RandomCrop+RandomHorizontalFlip into the
    jitted step; must equal applying ops.image augmentation manually with
    the same key splits then stepping without augmentation."""
    from test_train_stage3 import make_trainer
    from stylegan_for_facerec_tpu.ops.image import random_crop, random_hflip
    images = jnp.asarray(rng.randn(16, 40, 40, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 64, 16))
    key = jax.random.key(7)

    t_in = make_trainer(freeze_backbone_epochs=0, augment_crop=32)
    p, s, o = t_in.init(jax.random.key(0))
    mask = t_in.freeze_mask(p, frozen=False)
    _, _, _, m_in = t_in.train_step(p, s, o, images, labels, key,
                                    jnp.zeros((), jnp.int32), mask)

    rest, k_crop, k_flip = jax.random.split(key, 3)
    manual = random_hflip(k_flip, random_crop(k_crop, images, 32))
    t_out = make_trainer(freeze_backbone_epochs=0)
    p, s, o = t_out.init(jax.random.key(0))
    _, _, _, m_out = t_out.train_step(p, s, o, manual, labels, rest,
                                      jnp.zeros((), jnp.int32), mask)
    np.testing.assert_allclose(float(m_in["loss"]), float(m_out["loss"]),
                               rtol=1e-6)


def test_stage3_cli_packed_run_writes_metrics(tmp_path):
    """End-to-end CLI on packed shards: per-10-batch train_loss rows +
    epoch aggregates land in metrics.jsonl (train.py:329-331,351-355
    parity; VERDICT r2 next #7), and a checkpoint is written."""
    packed = tmp_path / "packed"
    _write_packed(str(packed), n=48, size=128, n_ids=8, shard_size=24)
    cfg = {"name": "t", "data_root": str(tmp_path),
           "train_subdir": "packed", "model_root": str(tmp_path / "ckpt"),
           "backbone": "MobileFaceNet", "emb_size": 64,
           "batch_size": 8, "num_epochs": 1, "freeze_backbone_epochs": 0,
           "num_workers": 2, "eval_benchmarks": []}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ)
    env["SGFR_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device: no mesh path
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_stage3.py"),
         "--config", str(cfg_path), "--max_steps", "6"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert "[data] packed: 48 images" in proc.stdout
    jsonl = tmp_path / "ckpt" / "t" / "logs" / "metrics.jsonl"
    rows = [json.loads(l) for l in jsonl.read_text().splitlines()]
    train_rows = [r for r in rows if "train_loss" in r]
    assert train_rows, rows
    assert {"train_top1", "train_top5", "lr"} <= set(train_rows[0])
    ep_rows = [r for r in rows if "train_loss_ep" in r]
    assert ep_rows and "train_acc_ep" in ep_rows[0] \
        and "imgs_per_sec" in ep_rows[0]
    assert np.isfinite(ep_rows[0]["train_loss_ep"])
