"""Vector-column utilities (SURVEY.md §2.3 F5, §2.8 M10, §2.5 A9)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_norm(v: Column) -> Column:
    """‖v‖₂ — reference l2_norm (/root/reference/lsh-qd.py:1245-1246)."""
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def euclidean_dist(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def min_max_normalize(
    df: DataFrame, col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """Global min-max normalization of an array column — the two-pass
    dataset normalization of /root/reference/datasets.py:76-81: one global
    agg for (min, max) over all elements, then a scaling projection."""
    out_col = out_col or col
    # NaN elements are EXCLUDED from the min/max scan: Spark's max orders
    # NaN above every double, so one NaN component in one vector would
    # make hi=NaN, span=NaN ('or 1.0' keeps NaN — it is truthy), and the
    # projection would rewrite EVERY element of EVERY vector to NaN with
    # no error (downstream p-stable floors those into one garbage
    # mega-bucket). NaN elements themselves still map to NaN in the
    # output — scaled, not laundered.
    finite = F.filter(F.col(col), lambda x: ~F.isnan(x.cast("double")))
    stats = df.select(
        F.min(F.array_min(finite)).alias("lo"),
        F.max(F.array_max(finite)).alias("hi"),
    ).first()
    if stats["lo"] is None or stats["hi"] is None:
        # empty DataFrame or all-NULL/all-NaN column: nothing to scale —
        # return the input unchanged (a bare float(None) TypeError
        # explains nothing)
        return df.withColumn(out_col, F.col(col))
    lo, hi = float(stats["lo"]), float(stats["hi"])
    span = (hi - lo) or 1.0
    return df.withColumn(
        out_col,
        F.transform(F.col(col), lambda x: (x - F.lit(lo)) / F.lit(span)),
    )


def mean_projected_distance(
    df: DataFrame, a_col: str, b_col: str
) -> float:
    """Mean pairwise distance diagnostic —
    calculate_average_projected_distance (/root/reference/experiments.py:56-78).

    ``nan`` on an empty/all-NULL input (avg returns NULL; a bare
    float(None) TypeError explains nothing — same guard as
    min_max_normalize above)."""
    d = df.select(
        F.avg(euclidean_dist(F.col(a_col), F.col(b_col))).alias("d")
    ).first()["d"]
    return float("nan") if d is None else float(d)


def pairwise_distance_histogram(
    pairs: DataFrame, dist_col: str = "dist", width: float = 0.1
) -> DataFrame:
    """(bucket, n): histogram of pair distances — plot_pairwise_dist
    (/root/reference/lsh-qd.py:718-734) as a table instead of a figure."""
    return (
        pairs.groupBy(
            F.floor(F.col(dist_col) / width).cast("long").alias("bucket")
        )
        .agg(F.count("*").alias("n"))
        .withColumn("lo", F.col("bucket") * width)
    )
