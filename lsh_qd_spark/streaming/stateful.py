"""Stateful streaming dedup: per-bucket state via ``applyInPandasWithState``.

Complement to :mod:`lsh_qd_spark.streaming.incremental` (foreachBatch +
parquet bucket index). Where the incremental mode re-joins every batch
against a persisted index table, this operator keeps each LSH bucket's
member list **in Spark's managed state store**, keyed by
``(band_idx, band_key)`` — the idiomatic Structured Streaming shape for
custom stateful logic (SURVEY.md §2.10; the reference is batch-only).

Dataflow (one continuous streaming query, no external index):

    pages stream → fused text→MinHash kernel → band posexplode
      → groupBy(band_idx, band_key).applyInPandasWithState(_bucket_dedup)
      → collision rows (id_a, id_b, band_idx)

Collision rows still need the cross-bucket ``n_bands >= alpha`` count and
Jaccard verification; both are plain batch aggregations over the sink (see
``collisions_to_pairs``) — state only has to be per-bucket, which is what
keeps it small and mergeable.

Scale/state design:
- State per key = the bucket's sorted member array, capped at
  ``max_bucket_size`` exactly like the batch path (operators/pairs.py): a
  boilerplate mega-bucket stops accumulating members and emits STAR edges
  against the bucket representative — O(n) state and O(n) output instead
  of O(n²).
- New members emit pairs only against PRIOR members + each other once
  (canonical ``id_a < id_b``), so a pair is emitted at most once per band
  across the whole stream — replay-safe modulo Spark's own state-store
  checkpointing, which is exactly the at-least-once contract foreachBatch
  gives too.
- No watermark/TTL: dedup state is permanent by design (a duplicate of a
  year-old page is still a duplicate). For bounded-retention dedup, set a
  ``GroupStateTimeout.ProcessingTimeTimeout`` and drop idle buckets.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from lsh_qd_spark.config import DedupConfig
from lsh_qd_spark.operators.pairs import counted_plus_stars
from lsh_qd_spark.plans.pipeline import DedupPipeline

COLLISION_SCHEMA = "id_a long, id_b long, band_idx int, via_star boolean"
_STATE_SCHEMA = "members array<long>, n_seen long, rep long"


def _bucket_dedup_factory(max_bucket_size: int):
    """Build the per-bucket state-update function (cap rides the closure)."""

    def update(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band_idx = int(key[0])
        if state.exists:
            members, n_seen, rep = state.get
            members = list(members)
        else:
            members, n_seen, rep = [], 0, None
        known = set(members)
        out_a: list[int] = []
        out_b: list[int] = []
        out_star: list[bool] = []
        for pdf in pdfs:
            for doc_id in sorted(int(x) for x in pdf["doc_id"]):
                if doc_id in known:
                    continue  # replayed row — already paired
                if rep is None:
                    rep = doc_id
                if n_seen < max_bucket_size:
                    for m in members:
                        a, b = (m, doc_id) if m < doc_id else (doc_id, m)
                        out_a.append(a)
                        out_b.append(b)
                        out_star.append(False)
                    members.append(doc_id)
                else:
                    # mega-bucket: STAR edge only (batch-path semantics,
                    # operators/pairs.py) — state stays capped
                    a, b = (rep, doc_id) if rep < doc_id else (doc_id, rep)
                    out_a.append(a)
                    out_b.append(b)
                    out_star.append(True)
                known.add(doc_id)
                n_seen += 1
        state.update((members, n_seen, rep))
        if out_a:
            yield pd.DataFrame(
                {
                    "id_a": out_a,
                    "id_b": out_b,
                    "band_idx": band_idx,
                    "via_star": out_star,
                }
            )

    return update


class StatefulDedup:
    """Continuous streaming dedup with bucket state in the state store."""

    def __init__(self, config: DedupConfig, work_dir: str):
        self.config = config
        self.work_dir = work_dir
        self.collisions_dir = f"{work_dir}/collisions"
        self.checkpoint_dir = f"{work_dir}/checkpoint"
        self.pipe = DedupPipeline(config)

    def collisions(self, pages_stream: DataFrame) -> DataFrame:
        """Streaming DataFrame of per-band collision rows."""
        buckets = self.pipe.buckets(
            self.pipe.signatures_from_text(pages_stream)
        )
        return buckets.groupBy("band_idx", "band_key").applyInPandasWithState(
            _bucket_dedup_factory(self.config.max_bucket_size),
            outputStructType=COLLISION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def start(self, spark, source_dir: str, max_files_per_trigger: int = 1):
        from lsh_qd_spark.io import (
            check_compat_meta,
            list_child_names,
            write_compat_meta,
        )
        from lsh_qd_spark.streaming.incremental import PAGES_STREAM_SCHEMA

        # State-store bucket membership is keyed by kernel-derived band
        # keys: resuming a checkpointed stream after a KERNEL_VERSION or
        # config change would probe new-generation keys against
        # old-generation state — zero duplicates against every pre-upgrade
        # document, silently. Same loud guard as the incremental index;
        # require the marker whenever checkpointed state already exists.
        # A checkpoint written before marker-stamping existed trips this
        # guard too (state, no marker): deliberate — we cannot tell "same
        # kernel, pre-marker release" from "different kernel" by looking,
        # and auto-stamping would launder the latter past every future
        # check. The operator who KNOWS the kernel/config is unchanged
        # migrates once with ``stamp_compat()`` (see the error text).
        check_compat_meta(
            self.work_dir,
            self.config.key_hash(),
            what="stateful stream state (if this checkpoint predates "
            "compat markers and was built by this exact kernel+config, "
            "migrate once with StatefulDedup.stamp_compat())",
            require_marker=bool(list_child_names(self.checkpoint_dir)),
        )
        # marker BEFORE the query starts (a marker without state is
        # harmless; state without a marker bricks resume)
        write_compat_meta(self.work_dir, self.config.key_hash())
        stream = (
            spark.readStream.schema(PAGES_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        return (
            self.collisions(stream)
            .writeStream.format("parquet")
            .option("path", self.collisions_dir)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def stamp_compat(self) -> None:
        """One-time migration for a checkpoint written before compat
        markers existed: stamp the CURRENT kernel/config hash onto
        ``work_dir`` so ``start()`` resumes it. Only call this when the
        checkpointed state is KNOWN to have been built by this exact
        kernel and config — stamping foreign state launders a band-key
        generation mix past every future check (see start())."""
        from lsh_qd_spark.io import write_compat_meta

        write_compat_meta(self.work_dir, self.config.key_hash())

    def pairs(self, spark) -> DataFrame:
        """Batch view over the collision sink: alpha-filtered candidate
        pairs (the cross-bucket half of candidate_pairs semantics)."""
        from lsh_qd_spark.io import path_exists

        if not path_exists(self.collisions_dir, spark):
            # stream never started / zero batches committed: the sink dir
            # was never created — mirror IncrementalDedup.hits()'s empty
            # view instead of raising PATH_NOT_FOUND (the facade promises
            # a mode-agnostic batch tail at any point in the stream's life)
            return spark.createDataFrame(
                [], "id_a long, id_b long, n_bands long, via_star boolean"
            )
        col = spark.read.schema(COLLISION_SCHEMA).parquet(self.collisions_dir)
        # A pair legitimately appears at most once per band; under the
        # at-least-once sink contract (state commit lost → micro-batch
        # replayed) a duplicate sink row would otherwise inflate n_bands
        # and push sub-alpha pairs over the threshold. Per-band dedup
        # makes the read side exactly-once, and it is cheap: it rides the
        # same (id_a, id_b) shuffle the count needs anyway.
        counted = (
            col.where(~F.col("via_star"))
            .dropDuplicates(["id_a", "id_b", "band_idx"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_bands"))
            .where(F.col("n_bands") >= self.config.alpha)
        )
        stars = col.where(F.col("via_star")).select("id_a", "id_b").distinct()
        # shared consumer-contract tail (checkpointed once, stars yield to
        # counted rows) — operators/pairs.counted_plus_stars
        return counted_plus_stars(counted, stars)
