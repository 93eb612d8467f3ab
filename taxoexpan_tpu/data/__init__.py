from .taxonomy import Taxon, Taxonomy
from .egobatch import EgoBatch, GroupBatch
from .sampler import MaskedGraphSampler
from .loader import GroupBatchLoader

__all__ = [
    "Taxon", "Taxonomy", "EgoBatch", "GroupBatch",
    "MaskedGraphSampler", "GroupBatchLoader",
]
