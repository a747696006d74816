from quickrank_tpu.data.dataset import (
    Dataset,
    PaddedDataset,
    gather_padded,
    scatter_flat,
    shard_and_pad,
)
from quickrank_tpu.data.svml import read_svml, write_svml

__all__ = [
    "Dataset",
    "PaddedDataset",
    "gather_padded",
    "scatter_flat",
    "shard_and_pad",
    "read_svml",
    "write_svml",
]
