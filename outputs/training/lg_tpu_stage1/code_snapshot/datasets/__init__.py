from .base_dataset import BaseDataset, DataLoader, collate, get_dataset

__all__ = ["BaseDataset", "DataLoader", "collate", "get_dataset"]
