from quickrank_tpu.data.dataset import (
    Dataset,
    PaddedDataset,
    gather_padded,
    pack_doc_values,
    scatter_flat,
    shard_and_pad,
    unpack_doc_values,
)
from quickrank_tpu.data.svml import read_svml, write_svml

__all__ = [
    "Dataset",
    "PaddedDataset",
    "gather_padded",
    "pack_doc_values",
    "scatter_flat",
    "shard_and_pad",
    "unpack_doc_values",
    "read_svml",
    "write_svml",
]
