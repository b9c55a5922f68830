"""lsh_qd_spark — a from-scratch PySpark-native near-duplicate detection engine.

Re-expresses the capabilities of the reference research codebase
(``smearle/lsh-qd``, surveyed in SURVEY.md) as an idiomatic Spark DataFrame
pipeline: shingle → MinHash signatures → LSH banding → skew-aware
candidate-pair join → Jaccard verify → connected-components clustering, plus SimHash,
suffix-array exact-overlap verification, p-stable hashing for real vectors,
approximate nearest-neighbor search, and text-analysis utilities for
large-scale training-data pipelines.

Nothing in this package is a port: the reference's in-memory dict-of-lists
hash tables (``/root/reference/lsh-qd.py:45-47``) dissolve into DataFrame
stages; only the hash-family math, banding semantics, and evaluation
methodology are carried over (see SURVEY.md §7).
"""

from lsh_qd_spark.config import DedupConfig
from lsh_qd_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
