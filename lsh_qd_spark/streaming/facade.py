"""One entry point over the two streaming dedup modes.

``IncrementalDedup`` (foreachBatch + persisted parquet bucket index) and
``StatefulDedup`` (``applyInPandasWithState`` bucket state in the managed
state store) implement the same logical operation — continuous LSH
candidate generation over a pages stream — with different state backends.
This facade gives them one construction point and one OUTPUT surface, so
downstream code (alpha count → Jaccard verify → connected components) is
written once and is mode-agnostic:

    sd = stream_dedup(config, work_dir, mode="stateful")
    sd.start(spark, source_dir).awaitTermination()
    sd.clusters(spark, docs)          # full batch tail over the sink

Choosing a mode (the 100 TB view):
- ``incremental``: index is a plain table (parquet/Iceberg) — queryable,
  compactable, shareable with the batch ``LSHIndex``; per-batch cost grows
  with the number of matching index shards read. Best when batches are
  large and the index should double as a batch asset.
- ``stateful``: state lives in Spark's state store (RocksDB in prod) —
  no external table, per-key incremental updates, exactly-once state.
  Best for low-latency small batches and pure streaming deployments.

Both emit per-band collision evidence; ``pairs()`` normalizes it to the
batch ``candidate_pairs`` shape ``(id_a, id_b, n_bands, via_star)`` with
canonical ``id_a < id_b``, so the verify/cluster tail is literally the
batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsh_qd_spark.config import DedupConfig
from lsh_qd_spark.operators.cluster import connected_components
from lsh_qd_spark.operators.pairs import counted_plus_stars
from lsh_qd_spark.operators.verify import verify_pairs_text
from lsh_qd_spark.streaming.incremental import IncrementalDedup
from lsh_qd_spark.streaming.stateful import StatefulDedup

MODES = ("incremental", "stateful")


class StreamDedup:
    """Mode-agnostic streaming dedup: start a stream, then read candidate
    pairs / verified pairs / duplicate clusters off the sink."""

    def __init__(
        self,
        config: DedupConfig,
        work_dir: str,
        mode: str = "incremental",
        n_shards: int = 64,
    ):
        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        self.config = config
        self.mode = mode
        self._impl = (
            IncrementalDedup(config, work_dir, n_shards=n_shards)
            if mode == "incremental"
            else StatefulDedup(config, work_dir)
        )

    def start(
        self,
        spark: SparkSession,
        source_dir: str,
        max_files_per_trigger: int = 4,
    ):
        # both impls accept the same spelling now — one delegation line,
        # no per-mode kwarg translation to drift
        return self._impl.start(
            spark, source_dir, max_files_per_trigger=max_files_per_trigger
        )

    # --- batch tail over the sink -------------------------------------

    def pairs(self, spark: SparkSession) -> DataFrame:
        """(id_a, id_b, n_bands, via_star), canonical ``id_a < id_b`` —
        the batch ``candidate_pairs`` shape, whichever mode produced it."""
        if self.mode == "stateful":
            return self._impl.pairs(spark)
        hits = self._impl.hits(spark)
        # hits are already alpha-filtered per epoch and canonicalized
        # (existing < new for intra-batch; any orientation vs the index);
        # a re-crawled doc_id can surface the same pair in a later epoch,
        # so aggregate with max(n_bands) rather than trusting uniqueness.
        canon = hits.select(
            F.least("new_doc", "existing_doc").alias("id_a"),
            F.greatest("new_doc", "existing_doc").alias("id_b"),
            "n_bands",
            "via_star",
        )
        counted = (
            canon.where(~F.col("via_star"))
            .groupBy("id_a", "id_b")
            .agg(F.max("n_bands").alias("n_bands"))
        )
        # mega-bucket star hits keep the sentinel n_bands=0 and yield to a
        # counted row for the same pair — the shared consumer-contract tail
        stars = canon.where(F.col("via_star")).select("id_a", "id_b").distinct()
        return counted_plus_stars(counted, stars)

    def verified_pairs(
        self,
        spark: SparkSession,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Candidate pairs Jaccard-verified against document text — the
        same fused kernel as the batch pipeline's verify stage."""
        # Materialize the pairs aggregation before verify consumes it:
        # verify's auto path counts distinct candidate ids, samples their
        # text, and joins the pairs twice — four consumers that would each
        # re-run the hits-scan → canonicalize → groupBy chain on a lazy
        # plan. The batch pipeline persists its pairs stage for the same
        # reason; post-alpha pairs are small, so eager localCheckpoint
        # (reference-tracked blocks, no session-lifetime leak) fits here.
        return verify_pairs_text(
            self.pairs(spark).localCheckpoint(eager=True),
            docs,
            self.config.jaccard_threshold,
            self.config.shingle_k,
            id_col=id_col,
            text_col=text_col,
            # honor the same execution knobs the batch pipeline forwards —
            # a memory-constrained config (fetch='shuffle' or a small
            # broadcast cap) must behave identically in streaming mode
            fetch=self.config.verify_fetch,
            broadcast_ids_cap=self.config.verify_broadcast_ids_cap,
        )

    def clusters(
        self,
        spark: SparkSession,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """(doc_id, cluster_id) duplicate clusters over the verified graph."""
        # connected_components consumes its edges twice (the count deciding
        # driver-vs-distributed, then the collect or sym-union); it
        # checkpoints the lazy verify plan internally so the Jaccard kernel
        # runs once.
        return connected_components(
            self.verified_pairs(spark, docs, text_col, id_col)
        )


def save_progress(query, work_dir: str) -> str:
    """Persist a finished streaming query's progress telemetry
    (``recentProgress``: per-batch numInputRows, state-store rows/memory,
    durations) to ``<work_dir>/metrics/query_progress.json`` — the
    Structured-Streaming-native half of the north rule's per-partition
    lineage + metrics. The incremental mode additionally writes per-epoch
    shard lineage itself (``IncrementalDedup.record_metrics``).

    ``recentProgress`` is a RING BUFFER (Spark keeps the last
    ``spark.sql.streaming.numRecentProgressUpdates`` entries, default 100),
    so this function MERGES with any previously-saved file, keyed by
    batchId: call it after each ``awaitTermination`` and a long backfill's
    full history accumulates instead of silently truncating to the tail."""
    import json

    from lsh_qd_spark.io import _join_ref, _read_text, _write_text, path_exists

    # URI-safe IO throughout: a remote work_dir (hdfs://, s3a://) handled
    # with driver-local os.path would create a junk LOCAL "s3a:/..."
    # directory, "succeed", and lose the telemetry when the driver
    # container exits — the exact hazard IncrementalDedup's own metrics
    # writer documents and avoids.
    path = _join_ref(_join_ref(work_dir, "metrics"), "query_progress.json")
    by_batch: dict = {}
    if path_exists(path):
        try:
            by_batch = {p["batchId"]: p for p in json.loads(_read_text(path))}
        except (ValueError, KeyError, TypeError) as e:
            # a previous run killed mid-write leaves truncated JSON here;
            # telemetry is the LEAST important artifact in the run — a
            # crash would propagate out of run_streaming BEFORE the
            # result tables are written, discarding the whole stream's
            # output over a merge of old progress rows. Start fresh.
            import warnings

            warnings.warn(
                f"corrupt {path!r} ({e}); overwriting with this run's "
                f"progress only",
                RuntimeWarning,
            )
    for p in query.recentProgress:
        d = json.loads(p.json)
        by_batch[d["batchId"]] = d
    _write_text(
        path, json.dumps([by_batch[k] for k in sorted(by_batch)], indent=2)
    )
    return path


def stream_dedup(
    config: DedupConfig,
    work_dir: str,
    mode: str = "incremental",
    n_shards: int = 64,
) -> StreamDedup:
    """Factory for :class:`StreamDedup` — the one-call streaming entry."""
    return StreamDedup(config, work_dir, mode=mode, n_shards=n_shards)
