"""ctypes wrapper for the native C++ fastloader (native/fastloader.cpp).

Compiles on first use (g++ -O3 -shared, links libjpeg) into a cache dir;
falls back cleanly to the Python ``DataLoader`` when the toolchain or
libjpeg is unavailable. API mirrors ``data.dataset.DataLoader``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Iterator, Optional, Tuple

import numpy as np

from .dataset import FacesDataset

_SRC = os.path.join(os.path.dirname(__file__), "..", "native",
                    "fastloader.cpp")
_CACHE = os.path.join(tempfile.gettempdir(), "sgfr_native")


def _build_library() -> Optional[str]:
    os.makedirs(_CACHE, exist_ok=True)
    # cache key = source HASH, not mtime: rsync/tar/docker deployments
    # preserve mtimes, and a stale .so with the old fl_next ABI would
    # silently corrupt batches
    src_bytes = open(_SRC, "rb").read()
    tag = hashlib.sha1(src_bytes).hexdigest()[:12]
    so_path = os.path.join(_CACHE, f"libfastloader-{tag}.so")
    if os.path.exists(so_path):
        return so_path
    base = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", _SRC, "-o", so_path, "-ljpeg", "-lpthread"]
    # full build first; hosts without the libpng dev library fall back to
    # a JPEG-only build (the wrapper routes PNG datasets to the Python
    # loader via fl_has_png)
    for extra in (["-lpng"], ["-DSGFR_NO_PNG"]):
        cmd = base[:-2] + extra + base[-2:]  # keep -ljpeg -lpthread last
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            return so_path
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            msg = getattr(e, "stderr", b"")
            last = f"{msg[:500] if msg else e}"
    print(f"[native_loader] build failed, falling back to python "
          f"loader: {last}")
    return None


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        so = _build_library()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.fl_create.restype = ctypes.c_void_p
        lib.fl_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint32, ctypes.c_int,
            ctypes.c_int]
        lib.fl_num_batches.restype = ctypes.c_int
        lib.fl_num_batches.argtypes = [ctypes.c_void_p]
        lib.fl_next.restype = ctypes.c_int
        lib.fl_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int32)]
        lib.fl_reset.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.fl_destroy.argtypes = [ctypes.c_void_p]
        lib.fl_has_png.restype = ctypes.c_int
        lib.fl_has_png.argtypes = []
        _lib = lib
    return _lib


class NativeDataLoader:
    """Threaded C++ decode/resize pipeline; same iteration contract as
    ``data.dataset.DataLoader`` (yields (images NHWC float32 [-1,1],
    labels int32))."""

    def __init__(self, dataset: FacesDataset, batch_size: int,
                 shuffle: bool = True, num_workers: int = 8,
                 drop_last: bool = True, seed: int = 0,
                 fast_decode: bool = False):
        # fast_decode: decode large JPEGs at the coarsest 1/2^k DCT scale
        # that still covers the target size, then bilinear-resize. Big
        # CPU savings on hosts feeding a small training resolution from
        # high-res sources; pixels differ slightly from the full-res
        # parity path, so it is opt-in.
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.fast_decode = fast_decode
        self._epoch = 0
        self._handle = None
        self._lib = _get_lib()
        if self._lib is None:
            raise RuntimeError("native loader unavailable")
        labels = np.asarray([dataset.label_of(i)
                             for i in range(len(dataset))], np.int32)
        self._labels = labels
        paths = [p.encode() for p in dataset.filenames]
        self._paths_arr = (ctypes.c_char_p * len(paths))(*paths)
        self._labels_arr = labels.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32))

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        lib = self._lib
        if self._handle is None:
            self._handle = lib.fl_create(
                self._paths_arr, len(self.ds), self._labels_arr,
                self.batch_size, self.ds.image_size, self.num_workers,
                int(self.shuffle), self.seed + self._epoch,
                int(self.drop_last), int(self.fast_decode))
        else:
            lib.fl_reset(self._handle, self.seed + self._epoch)
        self._epoch += 1
        s = self.ds.image_size
        images = np.empty((self.batch_size, s, s, 3), np.float32)
        labels = np.empty((self.batch_size,), np.int32)
        while True:
            # fl_next returns the REAL item count; a ragged drop_last=False
            # tail is trimmed so the contract matches the Python DataLoader
            n = lib.fl_next(
                self._handle,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if n < 0:
                # an item exhausted its 10 decode attempts; mirror the
                # Python DataLoader's contract instead of yielding a
                # zero image with a real class label
                raise RuntimeError("10 consecutive corrupt samples")
            if n == 0:
                break
            yield images[:n].copy(), labels[:n].copy()

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.fl_destroy(self._handle)
            self._handle = None


_NATIVE_EXTS = (".jpg", ".jpeg", ".png")


def make_loader(dataset: FacesDataset, batch_size: int, **kw):
    """Prefer the native loader; fall back to the Python one — also when
    the file list contains formats the C++ decoder does not handle (it
    decodes JPEG + PNG; anything else would be mis-treated as corrupt and
    silently resampled, skewing the training distribution)."""
    supported = all(f.lower().endswith(_NATIVE_EXTS)
                    for f in dataset.filenames)
    if getattr(dataset, "transform", None) is not None:
        supported = False  # per-image python transforms need the py loader
    if supported and any(f.lower().endswith(".png")
                         for f in dataset.filenames):
        # a JPEG-only build (no libpng on the host) would mis-treat PNGs
        # as corrupt and silently resample them
        lib = _get_lib()
        supported = lib is not None and bool(lib.fl_has_png())
    if supported:
        try:
            # TypeError: callers may pass Python-loader-only kwargs (e.g.
            # prefetch=) — degrade to the Python loader, don't crash only
            # on hosts where the native build succeeds
            return NativeDataLoader(dataset, batch_size, **kw)
        except (RuntimeError, OSError, TypeError):
            pass
    from .dataset import DataLoader
    kw.pop("fast_decode", None)  # native-only decode optimization
    return DataLoader(dataset, batch_size, **kw)
