from . import dataset, images_dataset, packed, randaugment, registry
from .dataset import DataLoader, FacesDataset, device_augment
from .images_dataset import GTResDataset, ImagesDataset, InferenceDataset
from .packed import (PackedLoader, PackedTrainDataset, device_prefetch,
                     is_packed_dir, pack_dataset, save_packed_meta,
                     write_packed)
from .randaugment import RandAugment

__all__ = ["dataset", "images_dataset", "packed", "randaugment",
           "DataLoader", "FacesDataset", "device_augment", "GTResDataset",
           "ImagesDataset", "InferenceDataset", "RandAugment",
           "PackedLoader", "PackedTrainDataset", "device_prefetch",
           "is_packed_dir", "pack_dataset", "save_packed_meta",
           "write_packed"]
