"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-dup query at sf0.001;
``queries()``/``oracle_sql()`` expose every operator of the engine (see
lsh_qd_spark/oracle.py and extra_queries.py). Every queries() entry has a
DuckDB oracle twin — including the suffix-array exact-overlap kernel, whose
twin uses the diagonal-runs LCS characterization.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Jaccard-verified near-duplicate pairs over the
    sf0.001 documents table (full shingle→minhash→band→pairs→verify run)."""
    from lsh_qd_spark.oracle import q_verified_pairs

    return q_verified_pairs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lsh_qd_spark import oracle
    from lsh_qd_spark import extra_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(oracle.SPARK_QUERIES)
    out.update(extra_queries.SPARK_ONLY_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from lsh_qd_spark import extra_queries, oracle

    out = dict(oracle.SQL_QUERIES)
    out.update(extra_queries.extra_sql_queries())
    return out
