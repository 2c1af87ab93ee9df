"""Host-side labeled faces dataset + input pipeline.

Parity target: ``/root/reference/dataset.py`` (``FacesDataset``) and the
stage-3 loader setup (``train.py:109-132``): ``<root>/<identity>/<file>.jpg``
tree, ``Ethnicity^id`` prefix stripping, corrupt-file skipping
(``dataset.py:77-91`` + ``collate_fn_ignore_none``,
``util/utils.py:361-369``), Resize(128) -> RandomCrop(112) ->
RandomHorizontalFlip -> Normalize(0.5, 0.5).

TPU-first split of responsibilities: host threads decode JPEGs and resize
to 128x128; the random crop/flip/normalize run batched on device
(ops/image.py). Corrupt files are replaced by resampling another index so
every batch keeps the static shape XLA needs (the reference instead
shrinks the batch — same data distribution, stable shapes).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

ETHNICITIES = ("African", "Asian", "Caucasian", "Indian")
CLASS2RACE: Dict[str, int] = {e: i for i, e in enumerate(ETHNICITIES)}


def _strip_ethnicity(identity: str) -> str:
    """'Caucasian^m49.r8743' -> 'm49.r8743' (``dataset.py:72-73``)."""
    if identity.startswith(ETHNICITIES) and "^" in identity:
        return identity[identity.rfind("^") + 1:]
    return identity


class FacesDataset:
    """Identity-labeled image-folder dataset."""

    def __init__(self, root: str, image_size: int = 128,
                 id2race_file: Optional[str] = None,
                 extensions: Sequence[str] = (".jpg", ".jpeg", ".png"),
                 transform=None):
        self.root = root
        self.image_size = image_size
        # host-side per-image augmentation on the decoded uint8 RGB array
        # (e.g. data.randaugment.RandAugment); when set, make_loader uses
        # the Python loader — the native decoder cannot apply it
        self.transform = transform
        self.filenames: List[str] = sorted(
            fn for ext in extensions
            for fn in glob(os.path.join(root, "*", f"*{ext}")))
        ids = sorted({_strip_ethnicity(fn.split(os.sep)[-2])
                      for fn in self.filenames})
        self.id_list = ids
        self.classes = ids
        self.id2label = {identity: i for i, identity in enumerate(ids)}
        self.n_identities = len(ids)
        self.id2race = None
        if id2race_file is not None:
            lines = open(id2race_file).read().splitlines()
            self.id2race = {l.split(" ")[0]: l.split(" ")[1] for l in lines}

    def __len__(self):
        return len(self.filenames)

    def label_of(self, idx: int) -> int:
        identity = _strip_ethnicity(self.filenames[idx].split(os.sep)[-2])
        return self.id2label[identity]

    def load(self, idx: int) -> Optional[Tuple[np.ndarray, int]]:
        """Decode + resize to (S, S, 3) float32 in [-1, 1]; None on a
        corrupt file (the reference's error contract)."""
        from PIL import Image
        fn = self.filenames[idx]
        try:
            img = Image.open(fn).convert("RGB")
            if self.transform is not None:
                img = Image.fromarray(
                    np.asarray(self.transform(np.asarray(img, np.uint8)),
                               np.uint8))
            s = self.image_size
            # the reference passes a LIST to transforms.Resize
            # (train.py:110 Resize([128, 128])), which resizes BOTH sides
            # exactly (aspect-distorting) — its inline comment says
            # "smaller side resized" but the code is the spec. The
            # per-image host RandomCrop happens on device instead, see
            # device_augment
            img = img.resize((s, s), Image.BILINEAR)
            arr = np.asarray(img, np.float32) / 255.0
        except Exception:
            return None
        arr = (arr - 0.5) / 0.5
        return arr, self.label_of(idx)

    def sample_weights_balanced(self) -> np.ndarray:
        """``make_weights_for_balanced_classes`` (``util/utils.py:58-79``):
        weight per sample = N / count(class)."""
        labels = np.array([self.label_of(i) for i in range(len(self))])
        counts = np.bincount(labels, minlength=self.n_identities)
        weight_per_class = len(self) / np.maximum(counts, 1)
        return weight_per_class[labels]


class DataLoader:
    """Threaded prefetching batch loader (replaces torch DataLoader's
    fork workers, ``train.py:129-132``): shuffle per epoch, drop_last,
    corrupt samples replaced by resampling."""

    def __init__(self, dataset: FacesDataset, batch_size: int,
                 shuffle: bool = True, num_workers: int = 8,
                 drop_last: bool = True, seed: int = 0,
                 prefetch: int = 4):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _load_with_retry(self, idx: int, rng: np.random.RandomState):
        for _ in range(10):
            out = self.ds.load(idx)
            if out is not None:
                return out
            idx = rng.randint(0, len(self.ds))
        raise RuntimeError("10 consecutive corrupt samples")

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        from concurrent.futures import ThreadPoolExecutor
        rng = np.random.RandomState(self.seed + self._epoch)
        self._epoch += 1
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)
        nb = len(self)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def make_batch(b):
            idxs = order[b * self.batch_size: (b + 1) * self.batch_size]
            items = list(pool.map(
                lambda i: self._load_with_retry(i, np.random.RandomState(
                    (self.seed + 7919 * i) % (2 ** 31))), idxs))
            imgs = np.stack([it[0] for it in items])
            labels = np.asarray([it[1] for it in items], np.int32)
            return imgs, labels

        from .packed import _pumped

        def batches():
            for b in range(nb):
                yield make_batch(b)

        try:
            # _pumped's timeout-put loop means an abandoned consumer never
            # leaves the producer parked forever in a blocking q.put on a
            # full queue (surfacing producer errors, e.g. '10 consecutive
            # corrupt samples', only after the queued batches drain)
            yield from _pumped(batches, self.prefetch,
                               "data loader producer failed")
        finally:
            pool.shutdown(wait=False)


def device_augment(key, images, crop: int = 112, hflip_p: float = 0.5):
    """Batched on-device train-time augmentation: RandomCrop(112) +
    RandomHorizontalFlip on the pre-resized 128x128 host batch
    (``train.py:109-117`` transform tail)."""
    import jax
    from ..ops.image import random_crop, random_hflip
    k1, k2 = jax.random.split(key)
    images = random_crop(k1, images, crop)
    return random_hflip(k2, images, hflip_p)
