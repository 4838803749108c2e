from .dataset import Slice3DDataset, SLICE_ORDER
from .pipeline import BatchLoader

__all__ = ["Slice3DDataset", "SLICE_ORDER", "BatchLoader"]
