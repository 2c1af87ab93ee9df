"""Data pipeline, config, checkpoint IO tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_for_facerec_tpu.data import (DataLoader, FacesDataset,
                                           ImagesDataset, RandAugment,
                                           device_augment)
from stylegan_for_facerec_tpu.utils import (CheckpointManager,
                                            Stage3Options,
                                            from_reference_stage3,
                                            load_checkpoint,
                                            save_checkpoint)


@pytest.fixture()
def faces_root(tmp_path, rng):
    from PIL import Image
    root = tmp_path / "faces"
    for ident in ("African^m.1", "African^m.2", "plain_id"):
        d = root / ident
        d.mkdir(parents=True)
        for i in range(3):
            arr = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    # one corrupt file
    (root / "plain_id" / "broken.jpg").write_bytes(b"not a jpeg")
    return str(root)


def test_faces_dataset_scan(faces_root):
    ds = FacesDataset(faces_root)
    assert len(ds) == 10            # 9 good + 1 corrupt
    # ethnicity prefix stripped -> ids m.1, m.2, plain_id
    assert ds.n_identities == 3
    assert ds.id_list == ["m.1", "m.2", "plain_id"]
    img, label = ds.load(0)
    assert img.shape == (128, 128, 3)
    assert -1.0 <= img.min() and img.max() <= 1.0


def test_corrupt_file_returns_none(faces_root):
    ds = FacesDataset(faces_root)
    broken = [i for i, f in enumerate(ds.filenames) if "broken" in f][0]
    assert ds.load(broken) is None


def test_loader_batches_and_repairs(faces_root):
    ds = FacesDataset(faces_root)
    dl = DataLoader(ds, batch_size=4, num_workers=2, seed=1)
    batches = list(dl)
    assert len(batches) == 2        # drop_last: 10 // 4
    for imgs, labels in batches:
        assert imgs.shape == (4, 128, 128, 3)   # corrupt sample resampled
        assert labels.shape == (4,)
        assert np.isfinite(imgs).all()


def test_device_augment(rng):
    x = jnp.asarray(rng.rand(4, 128, 128, 3).astype(np.float32))
    y = device_augment(jax.random.key(0), x, crop=112)
    assert y.shape == (4, 112, 112, 3)


def test_balanced_weights(faces_root):
    ds = FacesDataset(faces_root)
    w = ds.sample_weights_balanced()
    assert w.shape == (len(ds),)
    # class with 4 files (plain_id incl. broken) weighted lower than 3-file
    assert w.min() > 0


def test_images_dataset_pairs(tmp_path, rng):
    from PIL import Image
    src = tmp_path / "src"
    src.mkdir()
    for i in range(4):
        arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(src / f"{i}.jpg")
    ds = ImagesDataset(str(src), str(src), source_size=112, target_size=112)
    assert len(ds) == 4
    a, b = ds[0]
    assert a.shape == (112, 112, 3) and b.shape == (112, 112, 3)


def test_randaugment_runs(rng):
    aug = RandAugment()
    img = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
    out = aug(img)
    assert out.shape == (112, 112, 3)
    assert out.dtype == np.uint8


def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {"params": {"w": jnp.asarray(rng.randn(4, 3).astype(np.float32)),
                       "b": jnp.zeros(3)},
            "step": jnp.asarray(7)}
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, tree, metadata={"epoch": 3})
    back = load_checkpoint(p, like=tree)
    np.testing.assert_array_equal(np.asarray(back["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    assert int(back["step"]) == 7
    # structure-free restore via pickled treedef
    back2 = load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(back2["params"]["b"]),
                                  np.zeros(3))


def test_checkpoint_manager_best_and_gc(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "run"), keep=2)
    for step, metric in [(1, 5.0), (2, 3.0), (3, 4.0)]:
        mgr.save(step, {"x": jnp.asarray(step)}, metric=metric)
    assert os.path.exists(str(tmp_path / "run" / "best"))
    best = load_checkpoint(str(tmp_path / "run" / "best"),
                           like={"x": jnp.asarray(0)})
    assert int(best["x"]) == 2      # lowest metric
    steps = [d for d in os.listdir(str(tmp_path / "run"))
             if d.startswith("step_")]
    assert len(steps) == 2          # gc keeps last 2


def test_reference_config_conversion():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "refcfg", "/root/reference/configs/config_BUPT_IR_50_baseline.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    opts = from_reference_stage3(mod.configurations)
    assert opts.head == "ArcFace"
    assert opts.batch_size == 100
    assert opts.freeze_backbone_epochs == 3
    assert opts.encoder_checkpoint is None   # the baseline config's point
    # STAGES = [10,15,...,120]+5 (config_BUPT_IR_50_baseline.py:45)
    assert tuple(opts.stages) == tuple(range(15, 130, 5))
    # ENCODER_ADDITIONAL_DROPOUT (not DROPOUT) is the reference key
    assert opts.dropout == mod.configurations[1][
        "ENCODER_ADDITIONAL_DROPOUT"]
    # WARMUP=False in this config -> no warmup epochs; train.py defaults
    # WARMUP=True with NUM_EPOCH//25 otherwise
    assert opts.warmup_epochs == (0 if not mod.configurations[1]["WARMUP"]
                                  else opts.num_epochs // 25)
    # TRAIN_IMAGES_FOLDER joins DATA_ROOT verbatim (train.py:121);
    # dropping it trained from the wrong subdirectory
    assert opts.train_subdir == mod.configurations[1][
        "TRAIN_IMAGES_FOLDER"]
    assert opts.drop_last == mod.configurations[1]["DROP_LAST"]
    assert opts.num_workers == mod.configurations[1]["NUM_WORKERS"]


def test_orbax_checkpoint_backend_roundtrip(tmp_path, rng):
    """Opt-in orbax backend: same tree/metadata contract as npz, loadable
    through the same load_checkpoint (backend recorded in the manifest),
    including optax named-tuple states and manager-root resolution."""
    import optax
    import jax
    import jax.numpy as jnp
    from stylegan_for_facerec_tpu.utils.checkpoint import (
        CheckpointManager, load_checkpoint, load_metadata, save_checkpoint)

    params = {"w": jnp.asarray(rng.randn(4, 3).astype(np.float32)),
              "nested": {"b": jnp.arange(5, dtype=jnp.int32)}}
    tx = optax.adam(1e-3)
    tree = {"params": params, "opt": tx.init(params)}

    p = str(tmp_path / "ck")
    save_checkpoint(p, tree, metadata={"epoch": 3}, backend="orbax")
    out = load_checkpoint(p)
    assert load_metadata(p)["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure preserved (optax namedtuples) via pickled treedef
    assert jax.tree_util.tree_structure(out) == \
        jax.tree_util.tree_structure(tree)

    # manager-root resolution works for the orbax layout too
    mgr = CheckpointManager(str(tmp_path / "mgr"), backend="orbax")
    mgr.save(7, tree, metric=1.0)
    out2 = load_checkpoint(str(tmp_path / "mgr"), like=tree)
    np.testing.assert_array_equal(
        np.asarray(out2["params"]["w"]), np.asarray(params["w"]))
    assert load_metadata(str(tmp_path / "mgr" / "best"))["step"] == 7


def test_faces_dataset_transform_hook(tmp_path, rng):
    """Host transform applies before resize, and make_loader routes a
    transform-bearing dataset to the Python loader."""
    from PIL import Image
    from stylegan_for_facerec_tpu.data import FacesDataset
    from stylegan_for_facerec_tpu.data import native_loader
    from stylegan_for_facerec_tpu.data.dataset import DataLoader

    d = tmp_path / "faces" / "a"
    d.mkdir(parents=True)
    for i in range(3):
        arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}.jpg", quality=95)

    plain = FacesDataset(str(tmp_path / "faces"))
    inverted = FacesDataset(str(tmp_path / "faces"),
                            transform=lambda a: 255 - a)
    x0 = plain.load(0)[0]
    x1 = inverted.load(0)[0]
    # inversion in uint8 space ~ negation in [-1,1] space
    np.testing.assert_allclose(x1, -x0, atol=0.02)

    dl = native_loader.make_loader(inverted, batch_size=2)
    assert isinstance(dl, DataLoader)


def test_faces_dataset_resize_is_exact_square(tmp_path):
    """transforms.Resize([128,128]) with a LIST resizes BOTH sides exactly
    (train.py:110) — non-square sources are squashed, not center-cropped;
    edge content must survive."""
    from PIL import Image
    d = tmp_path / "id0"
    os.makedirs(d)
    arr = np.zeros((32, 64, 3), np.uint8)       # wide image
    arr[:, :4, 0] = 255                          # left edge red
    arr[:, -4:, 2] = 255                         # right edge blue
    Image.fromarray(arr).save(str(d / "a.png"))
    ds = FacesDataset(str(tmp_path), image_size=32)
    img, _ = ds.load(0)
    assert img.shape == (32, 32, 3)
    # a smaller-side-resize + center-crop would discard both edges
    assert img[:, 0, 0].mean() > 0.5, "left edge lost"
    assert img[:, -1, 2].mean() > 0.5, "right edge lost"
