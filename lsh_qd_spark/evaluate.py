"""Evaluation harness — recall / precision against planted ground truth.

The DataFrame re-expression of ``evaluate_scheme``
(``/root/reference/experiments.py:10-54``): per-query recall =
|pred ∩ truth| / |truth| (experiments.py:38-43), precision =
|pred ∩ truth| / |pred|, then averages — here one join + one aggregation
each instead of a Python loop over queries. Also the pair-set variant used
by the dup-pair-recall north-rule gate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PairMetrics:
    n_truth: int
    n_pred: int
    n_hit: int

    @property
    def recall(self) -> float:
        return self.n_hit / self.n_truth if self.n_truth else 1.0

    @property
    def precision(self) -> float:
        return self.n_hit / self.n_pred if self.n_pred else 1.0


def pair_metrics(
    pred: DataFrame, truth: DataFrame, keys=("id_a", "id_b")
) -> PairMetrics:
    """Dup-pair recall/precision over canonicalized (id_a < id_b) pairs —
    the north-rule gate statistic."""
    keys = list(keys)
    p = pred.select(keys).distinct()
    t = truth.select(keys).distinct()
    n_hit = p.join(t, keys).count()
    return PairMetrics(n_truth=t.count(), n_pred=p.count(), n_hit=n_hit)


def query_metrics(
    pred: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
) -> DataFrame:
    """(query_id, n_truth, n_pred, n_hit, recall, precision) per query plus
    grand averages via a final agg — experiments.py:33-54 as two joins.
    Queries missing from ``pred`` count as zero-recall (the reference's
    empty-prediction case)."""
    # SET semantics, like the reference's intersection-of-sets (and like
    # pair_metrics below): duplicate (query, doc) rows — e.g. an
    # ungrouped per-band or multi-probe output — would otherwise inflate
    # n_hit past n_truth and report recall > 1.0
    truth = truth.dropDuplicates([query_col, doc_col])
    pred = pred.dropDuplicates([query_col, doc_col])
    t = truth.groupBy(query_col).agg(F.count("*").alias("n_truth"))
    p = pred.groupBy(query_col).agg(F.count("*").alias("n_pred"))
    hits = (
        pred.join(truth, [query_col, doc_col])
        .groupBy(query_col)
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        t.join(p, query_col, "left")
        .join(hits, query_col, "left")
        .fillna(0, subset=["n_pred", "n_hit"])
        .withColumn("recall", F.col("n_hit") / F.col("n_truth"))
        .withColumn(
            "precision",
            F.when(F.col("n_pred") > 0, F.col("n_hit") / F.col("n_pred"))
            .otherwise(F.lit(1.0)),
        )
    )


def summarize(metrics: DataFrame) -> dict:
    """avg recall / precision / #predictions — the printout of
    experiments.py:48-52, as a dict."""
    row = metrics.agg(
        F.avg("recall").alias("avg_recall"),
        F.avg("precision").alias("avg_precision"),
        F.avg("n_pred").alias("avg_n_pred"),
        F.count("*").alias("n_queries"),
    ).first()
    return {k: row[k] for k in row.asDict()}
