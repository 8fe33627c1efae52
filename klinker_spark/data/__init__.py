from .blocks import BlockManager
from .dataset import Dataset
from .frames import EntityFrame, concat_frames, melt, reverse_rel

__all__ = ["BlockManager", "Dataset", "EntityFrame", "concat_frames", "melt", "reverse_rel"]
