from . import dataset, images_dataset, randaugment, registry
from .dataset import DataLoader, FacesDataset, device_augment
from .images_dataset import GTResDataset, ImagesDataset, InferenceDataset
from .randaugment import RandAugment

__all__ = ["dataset", "images_dataset", "randaugment", "DataLoader",
           "FacesDataset", "device_augment", "GTResDataset",
           "ImagesDataset", "InferenceDataset", "RandAugment"]
