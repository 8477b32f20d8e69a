from mamdr_tpu.data.dataset import (
    DomainSplit,
    MultiDomainDataset,
    stack_batches,
)
from mamdr_tpu.data.synthetic import make_synthetic_dataset

__all__ = [
    "DomainSplit",
    "MultiDomainDataset",
    "stack_batches",
    "make_synthetic_dataset",
]
