"""Incremental (streaming) near-duplicate detection.

The reference is fully batch (SURVEY.md §2.10) and the north rule's
checkpoint/resume is batch-shaped — but a crawl is naturally a stream, so
the engine also offers an incremental mode: Structured Streaming over a
pages source, ``foreachBatch`` per micro-batch:

  1. signature + bucket rows for the batch (same fused kernel as batch mode
     — identical signatures for identical text, so stream and batch agree);
  2. equi-join the batch's buckets against the ACCUMULATED bucket index
     (parquet dir — idempotent append keyed by epoch);
  3. emit (new_doc, existing_doc, n_bands) duplicate hits to a sink table;
  4. append the batch's buckets to the index.

Exactly-once-ish: Structured Streaming checkpointing replays failed
batches; the index append is epoch-tagged so replays overwrite rather than
double-append.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsh_qd_spark.config import DedupConfig
from lsh_qd_spark.plans.pipeline import DedupPipeline

PAGES_STREAM_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string"
)


class IncrementalDedup:
    """foreachBatch-driven incremental dedup over a streaming pages source."""

    def __init__(self, config: DedupConfig, work_dir: str):
        self.config = config
        self.work_dir = work_dir
        self.index_dir = os.path.join(work_dir, "bucket_index")
        self.hits_dir = os.path.join(work_dir, "dup_hits")
        self.checkpoint_dir = os.path.join(work_dir, "stream_checkpoint")
        self.pipe = DedupPipeline(config)

    def _index_exists(self, spark: SparkSession) -> bool:
        # dynamic partition overwrite writes only epoch=N/ dirs (no
        # top-level _SUCCESS marker)
        return os.path.isdir(self.index_dir) and any(
            f.startswith("epoch=") or f.endswith(".parquet")
            for f in os.listdir(self.index_dir)
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        buckets = self.pipe.buckets(
            self.pipe.signatures_from_text(batch_df)
        ).withColumn("epoch", F.lit(epoch_id))
        buckets = buckets.persist()
        if self._index_exists(spark):
            index = spark.read.parquet(self.index_dir)
            hits = (
                buckets.join(
                    index.withColumnRenamed("doc_id", "existing_doc"),
                    ["band_idx", "band_key"],
                )
                .where(F.col("doc_id") != F.col("existing_doc"))
                .groupBy(
                    F.col("doc_id").alias("new_doc"), F.col("existing_doc")
                )
                .agg(F.count("*").alias("n_bands"))
                .where(F.col("n_bands") >= self.config.alpha)
                .withColumn("epoch", F.lit(epoch_id))
            )
            hits.write.mode("append").parquet(self.hits_dir)
        # epoch-partitioned append → replayed epochs overwrite, not duplicate
        buckets.write.partitionBy("epoch").mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(self.index_dir)
        buckets.unpersist()

    def start(self, spark: SparkSession, source_dir: str, **read_options):
        """Stream pages from a directory source (swap for kafka in prod)."""
        stream = (
            spark.readStream.schema(PAGES_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", read_options.pop("maxFilesPerTrigger", 4))
            .parquet(source_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def hits(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.hits_dir)
