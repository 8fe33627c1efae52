"""klinker_spark — a PySpark-native entity-resolution blocking and
large-scale data-pipeline engine.

Brand-new implementation of the query/data-processing capabilities of
the reference blocking toolkit (dobraczka/klinker, surveyed in
SURVEY.md), re-expressed Spark-first: DataFrame/SQL for the relational
kernel, MLlib for LSH/ANN/TF-IDF, pandas-UDFs only where dense math is
unavoidable.
"""

from .data.blocks import BlockManager
from .data.dataset import Dataset
from .data.frames import EntityFrame, concat_frames, melt, reverse_rel
from .eval import Evaluation
from .session import get_spark

__all__ = [
    "BlockManager",
    "Dataset",
    "EntityFrame",
    "Evaluation",
    "concat_frames",
    "get_spark",
    "melt",
    "reverse_rel",
]
