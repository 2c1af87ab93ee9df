"""Packed pre-decoded training shards + prefetching loader.

The reference feeds stage-3 training through torch DataLoader fork workers
decoding JPEGs per epoch (``/root/reference/train.py:129-132``). On a TPU
host the decode cost makes the loader the bottleneck (round-2 bench: 1.76k
imgs/s decode vs 2.64k imgs/s step consumption), so the train-side analog
of the eval npz packing (``tools/pack_rfw.py`` /
``scripts/pack_RFW_in_bcolz.py``) is a packed format:

  <dir>/packed_meta.json            {image_size, n_images, shard_size,
                                     n_shards, id_list}
  <dir>/shard-00000.npy             uint8 (n, S, S, 3) NHWC
  <dir>/labels.npy                  int32 (N,)

uint8 NHWC keeps shards 4x smaller than float32 (and 4x cheaper to ship
host->device); normalization to [-1, 1] happens inside the jitted train
step (x / 127.5 - 1 == the reference's ToTensor + Normalize(0.5, 0.5)).
Shards are memory-mapped, so an epoch is pure page-cache reads -- no
decode work at train time.

``device_prefetch`` overlaps the host gather + host->device copy of batch
k+1 with the device step on batch k (double buffering), which the
reference gets from DataLoader worker processes + pin_memory.
"""

from __future__ import annotations

import json
import os
import queue as queue_mod
import threading
from typing import Iterator, Tuple

import numpy as np

from .dataset import FacesDataset

META_NAME = "packed_meta.json"


def save_packed_meta(out_dir: str, image_size: int, n_images: int,
                     shard_size: int, n_shards: int, id_list) -> dict:
    meta = {"image_size": image_size, "n_images": n_images,
            "shard_size": shard_size, "n_shards": n_shards,
            "id_list": list(id_list)}
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f)
    return meta


def write_packed(out_dir: str, images: np.ndarray, labels: np.ndarray,
                 id_list, shard_size: int = 8192) -> dict:
    """Write in-memory uint8 NHWC ``images`` + int labels as a packed
    directory (the single owner of the shard-%05d/labels.npy/meta layout
    for array-at-once writers; the streaming path is ``pack_dataset``)."""
    assert images.dtype == np.uint8 and images.ndim == 4
    n = len(images)
    assert len(labels) == n
    os.makedirs(out_dir, exist_ok=True)
    n_shards = -(-n // shard_size)
    for i in range(n_shards):
        np.save(os.path.join(out_dir, f"shard-{i:05d}.npy"),
                images[i * shard_size: (i + 1) * shard_size])
    np.save(os.path.join(out_dir, "labels.npy"),
            np.asarray(labels, np.int32))
    return save_packed_meta(out_dir, images.shape[1], n, shard_size,
                            n_shards, id_list)


def _pumped(make_items, maxsize: int, err_msg: str):
    """Yield items produced by ``make_items()`` (an iterable factory) from
    a daemon producer thread through a bounded queue. A producer exception
    is re-raised on the consumer AFTER the queued items drain (an error
    must never read as a short epoch); abandoning the consumer stops the
    producer."""
    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=maxsize)
    stop = object()
    abandoned = threading.Event()
    failure = []

    def producer():
        try:
            for item in make_items():
                if abandoned.is_set():
                    return
                while not abandoned.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue_mod.Full:
                        continue
        except Exception as e:  # noqa: BLE001 — re-raised on consumer
            if not abandoned.is_set():
                failure.append(e)
        finally:
            while not abandoned.is_set():
                try:
                    q.put(stop, timeout=0.5)
                    return
                except queue_mod.Full:
                    continue

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is stop:
                if failure:
                    raise RuntimeError(err_msg) from failure[0]
                return
            yield item
    finally:
        abandoned.set()


def pack_dataset(dataset: FacesDataset, out_dir: str,
                 shard_size: int = 8192, num_workers: int = 8,
                 batch_size: int = 256, progress: bool = True) -> dict:
    """Decode every image of ``dataset`` once (native C++ loader when
    available) and write uint8 shards. Returns the metadata dict."""
    from .native_loader import make_loader
    os.makedirs(out_dir, exist_ok=True)
    n = len(dataset)
    s = dataset.image_size
    loader = make_loader(dataset, batch_size, shuffle=False,
                         num_workers=num_workers, drop_last=False)
    labels_out = np.empty((n,), np.int32)
    shard = np.empty((shard_size, s, s, 3), np.uint8)
    written = 0          # images written to finished shards
    fill = 0             # images in the current shard buffer
    shard_idx = 0

    def flush():
        nonlocal shard_idx, written, fill
        if fill == 0:
            return
        np.save(os.path.join(out_dir, f"shard-{shard_idx:05d}.npy"),
                shard[:fill])
        shard_idx += 1
        written += fill
        fill = 0

    for images, labels in loader:
        # loaders yield float32 [-1,1]; invert x = u/127.5 - 1 exactly
        u8 = np.rint((images + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        b = len(labels)
        labels_out[written + fill: written + fill + b] = labels
        off = 0
        while off < b:
            take = min(shard_size - fill, b - off)
            shard[fill: fill + take] = u8[off: off + take]
            fill += take
            off += take
            if fill == shard_size:
                flush()
        if progress and shard_idx % 8 == 0:
            print(f"[pack] {written + fill}/{n} images", flush=True)
    flush()
    assert written == n, f"packed {written} of {n} images"
    np.save(os.path.join(out_dir, "labels.npy"), labels_out)
    return save_packed_meta(out_dir, s, n, shard_size, shard_idx,
                            dataset.id_list)


def is_packed_dir(path: str) -> bool:
    return os.path.exists(os.path.join(path, META_NAME))


class PackedTrainDataset:
    """Memory-mapped view over a packed directory."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, META_NAME)) as f:
            self.meta = json.load(f)
        self.image_size = int(self.meta["image_size"])
        self.n_images = int(self.meta["n_images"])
        self.shard_size = int(self.meta["shard_size"])
        self.id_list = list(self.meta["id_list"])
        self.n_identities = len(self.id_list)
        self.labels = np.load(os.path.join(root, "labels.npy"))
        self.shards = [
            np.load(os.path.join(root, f"shard-{i:05d}.npy"),
                    mmap_mode="r")
            for i in range(int(self.meta["n_shards"]))]

    def __len__(self):
        return self.n_images

    def gather(self, idxs: np.ndarray) -> np.ndarray:
        """(B, S, S, 3) uint8 for global indices ``idxs``."""
        out = np.empty((len(idxs), self.image_size, self.image_size, 3),
                       np.uint8)
        sh = idxs // self.shard_size
        off = idxs % self.shard_size
        # group by shard: one fancy-index per touched shard keeps the
        # reads sequential-ish within each mmap
        order = np.argsort(sh, kind="stable")
        pos = 0
        while pos < len(idxs):
            s0 = sh[order[pos]]
            end = pos
            while end < len(idxs) and sh[order[end]] == s0:
                end += 1
            sel = order[pos:end]
            out[sel] = self.shards[s0][off[sel]]
            pos = end
        return out


class PackedLoader:
    """Same iteration contract as ``data.dataset.DataLoader`` but yields
    (uint8 NHWC, int32) with zero decode work; a producer thread keeps
    ``prefetch`` batches gathered ahead.

    Multi-process SPMD: ``batch_size`` is always the GLOBAL batch.
    With ``num_processes > 1`` every process derives the IDENTICAL
    global shuffle (seed + epoch counter) and yields only its
    ``process_id``-th contiguous slice of each global batch
    (``batch_size // num_processes`` rows) — together the processes
    cover each batch exactly once, and
    ``jax.make_array_from_process_local_data`` stitches the slices
    into the global array (see ``device_prefetch``)."""

    def __init__(self, dataset: PackedTrainDataset, batch_size: int,
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 4, num_workers: int = 0,
                 process_id: int = 0, num_processes: int = 1):
        # num_workers accepted (and ignored) for make_loader signature
        # compatibility -- gathering from mmap is memcpy-bound
        assert batch_size % num_processes == 0, (
            f"global batch {batch_size} must divide over "
            f"{num_processes} processes")
        assert 0 <= process_id < num_processes
        # a ragged final batch would give the processes unequal local
        # slices, which cannot assemble into one global array
        assert num_processes == 1 or drop_last, (
            "multi-process loading requires drop_last=True")
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.process_id = process_id
        self.num_processes = num_processes
        self._epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        rng = np.random.RandomState(self.seed + self._epoch)
        self._epoch += 1
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)
        nb = len(self)
        local = self.batch_size // self.num_processes
        lo = self.process_id * local

        def batches():
            for b in range(nb):
                start = b * self.batch_size + lo
                end = start + local if self.num_processes > 1 \
                    else min(start + local, len(order))
                idxs = order[start:end]
                yield (self.ds.gather(idxs),
                       self.ds.labels[idxs].astype(np.int32))

        yield from _pumped(batches, self.prefetch,
                           "PackedLoader producer failed")


def device_prefetch(iterator, sharding=None, depth: int = 2):
    """Double-buffered host->device pipeline: ship batch k+1 while the
    device runs batch k (the TPU-native replacement for torch pin_memory +
    worker prefetch, ``train.py:129-132``).

    ``sharding`` is an optional jax.sharding.Sharding (or a (img, label)
    pair of them) applied in the background thread's ``device_put``.

    Multi-process SPMD (pod slices): when ``jax.process_count() > 1``
    the iterator's batches are this process's LOCAL slice of the global
    batch (e.g. ``PackedLoader(num_processes=N, process_id=i)``), and
    each is assembled into a global jax.Array via
    ``jax.make_array_from_process_local_data`` — no host ever
    materializes the full global batch. A sharding is required there
    (there is no meaningful default placement across processes).
    """
    import jax

    if sharding is None or isinstance(sharding, (tuple, list)):
        shardings = sharding
    else:
        shardings = (sharding, sharding)
    multiprocess = jax.process_count() > 1
    if multiprocess and shardings is None:
        raise ValueError(
            "device_prefetch: multi-process jax needs an explicit "
            "sharding (the global batch layout) to assemble per-process "
            "local batches")

    def shipped():
        import numpy as _np
        for images, labels in iterator:
            if multiprocess:
                yield (jax.make_array_from_process_local_data(
                           shardings[0], _np.asarray(images)),
                       jax.make_array_from_process_local_data(
                           shardings[1], _np.asarray(labels)))
            elif shardings is not None:
                yield (jax.device_put(images, shardings[0]),
                       jax.device_put(labels, shardings[1]))
            else:
                yield (jax.device_put(images), jax.device_put(labels))

    yield from _pumped(shipped, depth, "prefetch producer failed")
