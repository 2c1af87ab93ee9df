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
