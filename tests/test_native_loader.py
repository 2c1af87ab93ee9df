"""Native C++ fastloader: build, decode parity vs PIL, ordering, corrupt
handling, epoch reset."""

import os

import numpy as np
import pytest

from stylegan_for_facerec_tpu.data import FacesDataset
from stylegan_for_facerec_tpu.data import native_loader


@pytest.fixture(scope="module")
def lib_available():
    if native_loader._get_lib() is None:
        pytest.skip("native toolchain/libjpeg unavailable")
    return True


@pytest.fixture()
def faces_root(tmp_path, rng):
    from PIL import Image
    root = tmp_path / "faces"
    for ident in ("a", "b"):
        d = root / ident
        d.mkdir(parents=True)
        for i in range(10):
            arr = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg", quality=95)
    (root / "a" / "zz_bad.jpg").write_bytes(b"not a jpeg")
    return str(root)


def test_native_matches_pil(lib_available, faces_root):
    ds = FacesDataset(faces_root)
    dl = native_loader.NativeDataLoader(ds, batch_size=4, shuffle=False,
                                        num_workers=3)
    imgs, labels = next(iter(dl))
    for j in range(4):
        ref = ds.load(j)
        assert ref is not None
        # 1/255 tolerance: PIL quantizes to uint8 after resize, we don't
        assert np.abs(imgs[j] - ref[0]).max() <= 1.1 / 255 * 2
        assert labels[j] == ref[1]


def test_native_corrupt_and_epochs(lib_available, faces_root):
    ds = FacesDataset(faces_root)
    dl = native_loader.NativeDataLoader(ds, batch_size=7, shuffle=True,
                                        num_workers=4, seed=3)
    batches1 = [lbl.copy() for _, lbl in dl]
    assert len(batches1) == len(ds) // 7
    for _, imgs in zip(batches1, []):
        pass
    # second epoch reshuffles
    batches2 = [lbl.copy() for _, lbl in dl]
    assert len(batches2) == len(batches1)
    assert any(not np.array_equal(a, b)
               for a, b in zip(batches1, batches2))
    # all images finite despite the corrupt file
    for imgs, _ in dl:
        assert np.isfinite(imgs).all()


def test_make_loader_fallback(faces_root, monkeypatch):
    from stylegan_for_facerec_tpu.data.dataset import DataLoader
    monkeypatch.setattr(native_loader, "_get_lib", lambda: None)
    ds = FacesDataset(faces_root)
    dl = native_loader.make_loader(ds, batch_size=4)
    assert isinstance(dl, DataLoader)


def test_native_decodes_png(lib_available, tmp_path, rng):
    """PNG files must decode natively (ADVICE r1: they used to be treated
    as corrupt and silently resampled)."""
    from PIL import Image
    root = tmp_path / "pngfaces"
    want = {}
    for ident in ("a", "b"):
        d = root / ident
        d.mkdir(parents=True)
        for i in range(3):
            arr = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")   # lossless
            want[f"{ident}/{i}"] = arr
    ds = FacesDataset(str(root))
    dl = native_loader.make_loader(ds, batch_size=3, shuffle=False,
                                   num_workers=2)
    assert isinstance(dl, native_loader.NativeDataLoader)
    seen = 0
    for imgs, labels in dl:
        for j in range(imgs.shape[0]):
            ref = ds.load(seen + j)
            assert np.abs(imgs[j] - ref[0]).max() <= 1.1 / 255 * 2
        seen += imgs.shape[0]
    assert seen == len(ds)


def test_native_ragged_tail_matches_python(lib_available, faces_root):
    """drop_last=False: the native loader must yield a SMALLER final batch
    (real count via fl_next), not a padded one (ADVICE r1)."""
    from stylegan_for_facerec_tpu.data.dataset import DataLoader
    ds = FacesDataset(faces_root)
    n = len(ds)
    bs = 8
    assert n % bs != 0, "fixture should produce a ragged tail"
    ndl = native_loader.NativeDataLoader(ds, batch_size=bs, shuffle=False,
                                         num_workers=2, drop_last=False)
    pdl = DataLoader(ds, batch_size=bs, shuffle=False, drop_last=False)
    nb = [(i.shape[0], l.copy()) for i, l in ndl]
    pb = [(i.shape[0], np.asarray(l)) for i, l in pdl]
    assert [c for c, _ in nb] == [c for c, _ in pb]
    assert nb[-1][0] == n % bs
    for (_, ln), (_, lp) in zip(nb, pb):
        np.testing.assert_array_equal(ln, lp)


def test_make_loader_rejects_unsupported_format(faces_root, tmp_path, rng):
    """Non-JPEG/PNG files route to the Python loader instead of being
    mis-decoded as corrupt."""
    from PIL import Image
    from stylegan_for_facerec_tpu.data.dataset import DataLoader
    root = tmp_path / "bmpfaces"
    d = root / "a"
    d.mkdir(parents=True)
    for i in range(4):
        arr = (rng.rand(112, 112, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}.bmp")
    ds = FacesDataset(str(root), extensions=(".bmp",))
    assert len(ds) == 4
    dl = native_loader.make_loader(ds, batch_size=2)
    assert isinstance(dl, DataLoader)


def test_native_loader_many_epochs_stress(lib_available, faces_root):
    """Repeated epoch resets with multiple workers: no deadlock, stable
    batch counts, all finite."""
    ds = FacesDataset(faces_root)
    dl = native_loader.NativeDataLoader(ds, batch_size=5, shuffle=True,
                                        num_workers=5, seed=11)
    for epoch in range(6):
        n = 0
        for imgs, labels in dl:
            assert np.isfinite(imgs).all()
            n += 1
        assert n == len(ds) // 5


def test_make_loader_routes_png_to_python_when_png_unsupported(
        tmp_path, rng, monkeypatch):
    """A JPEG-only native build (no libpng on the host) must not mis-treat
    PNGs as corrupt; make_loader falls back to the Python loader."""
    from PIL import Image

    root = tmp_path / "faces"
    d = root / "a"
    d.mkdir(parents=True)
    arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "x.png")
    Image.fromarray(arr).save(d / "y.jpg")
    ds = FacesDataset(str(root), image_size=32)

    class NoPngLib:
        def fl_has_png(self):
            return 0

    monkeypatch.setattr(native_loader, "_get_lib", lambda: NoPngLib())
    loader = native_loader.make_loader(ds, batch_size=2, num_workers=1,
                                      drop_last=False)
    from stylegan_for_facerec_tpu.data.dataset import DataLoader
    assert isinstance(loader, DataLoader)


def test_build_cache_keyed_by_source_hash(tmp_path, monkeypatch):
    """rsync/tar deployments preserve mtimes; the .so name embeds a source
    hash so a changed source can never reuse a stale-ABI library."""
    monkeypatch.setattr(native_loader, "_CACHE", str(tmp_path / "cache"))
    so1 = native_loader._build_library()
    if so1 is None:
        pytest.skip("native toolchain unavailable")
    src = open(native_loader._SRC, "rb").read()
    import hashlib
    assert hashlib.sha1(src).hexdigest()[:12] in so1


def test_fast_decode_small_sources_identical(lib_available, faces_root):
    """fast_decode on sources < 2x the target size must be a no-op: the
    DCT scale search only fires when a 1/2 decode still covers the
    target, so 112px sources at 112px target decode identically."""
    ds = FacesDataset(faces_root)   # 112px sources, 112px target
    kw = dict(batch_size=4, shuffle=False, num_workers=2)
    a = next(iter(native_loader.NativeDataLoader(ds, **kw)))
    b = next(iter(native_loader.NativeDataLoader(ds, fast_decode=True,
                                                 **kw)))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_fast_decode_large_sources_close(lib_available, tmp_path):
    """512px smooth JPEGs to a 64px target: fast_decode decodes at 1/8
    DCT scale; output must stay close to the full-res parity path and
    keep labels exact."""
    from PIL import Image
    root = tmp_path / "big"
    d = root / "id0"
    d.mkdir(parents=True)
    yy, xx = np.mgrid[0:512, 0:512] / 511.0
    for i in range(4):
        # smooth gradients (DCT downscale error is bounded); vary phase
        arr = np.stack([np.sin(3 * xx + i), np.cos(2 * yy),
                        xx * yy], -1)
        arr = ((arr - arr.min()) / (arr.max() - arr.min()) * 255)
        Image.fromarray(arr.astype(np.uint8)).save(d / f"{i}.jpg",
                                                   quality=95)
    ds = FacesDataset(str(root), image_size=64)
    kw = dict(batch_size=4, shuffle=False, num_workers=2, drop_last=False)
    slow = next(iter(native_loader.NativeDataLoader(ds, **kw)))
    fast = next(iter(native_loader.NativeDataLoader(ds, fast_decode=True,
                                                    **kw)))
    np.testing.assert_array_equal(slow[1], fast[1])
    # [-1,1] scale: mean deviation well under one gray level x 4
    assert np.abs(slow[0] - fast[0]).mean() < 4 / 127.5, \
        np.abs(slow[0] - fast[0]).mean()


def test_native_all_corrupt_raises(lib_available, tmp_path):
    """When an item exhausts its 10 decode attempts the loader must RAISE
    (fl_next -1), mirroring the Python DataLoader — not yield a zero
    image labeled with a real class."""
    root = tmp_path / "bad"
    d = root / "id0"
    d.mkdir(parents=True)
    for i in range(4):
        (d / f"{i}.jpg").write_bytes(b"definitely not a jpeg")
    ds = FacesDataset(str(root))
    dl = native_loader.NativeDataLoader(ds, batch_size=2, shuffle=False,
                                        num_workers=1)
    with pytest.raises(RuntimeError, match="corrupt"):
        list(dl)
