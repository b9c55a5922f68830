#!/usr/bin/env python
"""Host-weather-independent pipeline probe: run the bench dedup job once
and report total shuffle bytes written/read, task-seconds, and job/stage
counts from the Spark status API. Shuffle bytes and stage structure are
deterministic per plan (unlike wall-clock on a shared host), so this is
the honest before/after instrument for shuffle-removal changes
(OPTIMIZATION_r06.md cites these numbers).

Usage: python scripts/shuffle_probe.py [n_docs] [label]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "40g")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    label = sys.argv[2] if len(sys.argv) > 2 else "probe"
    import bench
    from lsh_qd_spark.config import DedupConfig, RuntimeConfig
    from lsh_qd_spark.plans.pipeline import DedupPipeline
    from lsh_qd_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"shuffle_probe_{label}",
        master=f"local[{cpus}]",
        runtime=RuntimeConfig(
            shuffle_partitions=max(8, 2 * cpus),
            extra_confs={"spark.ui.enabled": "true"},
        ),
    )
    path = bench._ensure_corpus(spark, n_docs)
    docs = spark.read.parquet(path)
    pipe = DedupPipeline(DedupConfig(**bench.BENCH_CFG))
    # warm pass (outside the measured window), as the bench workers do
    pipe.signatures_from_text(docs.limit(2000)).count()

    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications", timeout=5) as r:
        app_id = json.load(r)[0]["id"]

    def stages() -> list[dict]:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as r:
            return json.load(r)

    def snap() -> dict:
        ss = stages()
        return {
            "stages": len(ss),
            "task_sec": round(
                sum(s.get("executorRunTime", 0) for s in ss) / 1000.0, 1
            ),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in ss) / 1e6, 1
            ),
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in ss) / 1e6, 1
            ),
            "input_mb": round(
                sum(s.get("inputBytes", 0) for s in ss) / 1e6, 1
            ),
        }

    before = snap()
    t0 = time.time()
    out = pipe.run(docs)
    out["clusters"].count()
    wall = time.time() - t0
    after = snap()
    pipe.release()
    delta = {k: round(after[k] - before[k], 1) for k in before}
    delta.update(label=label, n_docs=n_docs, wall_s=round(wall, 1))
    print(json.dumps(delta))
    spark.stop()


if __name__ == "__main__":
    main()
