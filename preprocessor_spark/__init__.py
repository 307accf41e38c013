"""preprocessor_spark — a PySpark-native analytics/preprocessing engine.

Re-implements (Spark-first, from public knowledge only) the query and
data-processing capabilities of the Clearbox-AI/preprocessor reference
library: fit/transform/inverse_transform tabular preprocessing, plus a full
relational query surface and LLM-data-pipeline operators (deduplication,
similarity search, text analysis, multimodal plumbing) designed for
100 TB-scale execution on a Spark cluster.
"""

from .caching import persist_scope, register_persisted
from .preprocessor import FittedState, Preprocessor
from .session import get_spark

__all__ = ["Preprocessor", "FittedState", "get_spark", "persist_scope", "register_persisted"]
