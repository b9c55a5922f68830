"""Connected components: distributed hash-min vs driver NumPy path —
identical labels (min doc_id per component) on random graphs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_qd_spark.operators.cluster import connected_components


def _truth(edges, verts=()):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set(verts)
    for a, b in edges:
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for v in nodes:
        comp.setdefault(find(v), []).append(v)
    out = {}
    for vs in comp.values():
        m = min(vs)
        for v in vs:
            out[v] = m
    return out


@pytest.fixture(scope="module")
def random_graph():
    rng = np.random.default_rng(31)
    edges = [
        (int(rng.integers(0, 400)), int(rng.integers(0, 400)))
        for _ in range(300)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    return edges


@pytest.mark.parametrize("threshold", [0, 10_000_000])
def test_cc_matches_union_find(spark, random_graph, threshold):
    """threshold=0 forces the distributed hash-min loop; the large
    threshold takes the driver NumPy path — labels must be identical."""
    edges_df = spark.createDataFrame(random_graph, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            edges_df, driver_edge_threshold=threshold
        ).collect()
    }
    assert got == _truth(random_graph)


def test_cc_with_singleton_vertices(spark, random_graph):
    verts = spark.range(450).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            spark.createDataFrame(random_graph, "id_a long, id_b long"),
            vertices=verts,
        ).collect()
    }
    truth = _truth(random_graph, verts=range(450))
    assert got == truth
    # ids not touched by any edge are their own singleton cluster
    edge_nodes = {v for e in random_graph for v in e}
    for v in range(450):
        if v not in edge_nodes:
            assert got[v] == v


def test_cc_long_chain_distributed(spark):
    """Chain of length 40: stresses iteration count of the distributed
    loop (converges via doubling in O(log n) thanks to min-propagation)."""
    chain = [(i, i + 1) for i in range(40)]
    edges_df = spark.createDataFrame(chain, "id_a long, id_b long")
    got = connected_components(edges_df, driver_edge_threshold=0, max_iter=50)
    labels = {r["doc_id"]: r["cluster_id"] for r in got.collect()}
    assert set(labels.values()) == {0}


def test_cc_empty(spark):
    edges_df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges_df).count() == 0


def test_cc_empty_edges_with_vertices(spark):
    """No duplicate edges at all: every vertex is its own singleton —
    both the driver short-circuit and the distributed path."""
    edges_df = spark.createDataFrame([], "id_a long, id_b long")
    verts = spark.range(10).select(F.col("id").alias("doc_id"))
    for threshold in (2_000_000, 0):
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(
                edges_df, vertices=verts, driver_edge_threshold=threshold
            ).collect()
        }
        assert got == {i: i for i in range(10)}


def test_cc_driver_path_vertices_stay_distributed(spark, random_graph):
    """The driver short-circuit collects ONLY edges; singleton vertices are
    appended via a distributed anti-join (a corpus-sized vertex table must
    never ride the driver path). Labels identical to the distributed loop."""
    edges_df = spark.createDataFrame(random_graph, "id_a long, id_b long")
    verts = spark.range(450).select(F.col("id").alias("doc_id"))
    driver = connected_components(edges_df, vertices=verts)
    dist = connected_components(edges_df, vertices=verts, driver_edge_threshold=0)
    as_map = lambda df: {r["doc_id"]: r["cluster_id"] for r in df.collect()}
    assert as_map(driver) == as_map(dist)
    # the driver-path plan must not contain a vertex-table collect: the
    # singleton branch shows up as a join, so the result is a real
    # distributed plan, not a LocalTableScan of 450 pre-collected rows
    assert "Join" in driver._jdf.queryExecution().executedPlan().toString()


def test_cc_string_ids_both_paths(spark):
    """Non-integer doc ids (url-keyed corpora) work on BOTH paths with
    identical labels and the INPUT id type preserved — the driver fast
    path must not coerce to int64 (it used to crash on strings) and the
    singleton/empty schemas must match the edge id type."""
    edges = [
        ("url-b", "url-a"),
        ("url-c", "url-b"),
        ("url-e", "url-d"),
    ]
    edges_df = spark.createDataFrame(edges, "id_a string, id_b string")
    verts = spark.createDataFrame(
        [(f"url-{c}",) for c in "abcdefg"], "doc_id string"
    )
    truth = _truth(edges, verts=[f"url-{c}" for c in "abcdefg"])
    for threshold in (2_000_000, 0):
        got_df = connected_components(
            edges_df, vertices=verts, driver_edge_threshold=threshold
        )
        assert [f.dataType.simpleString() for f in got_df.schema.fields] == [
            "string",
            "string",
        ]
        got = {r["doc_id"]: r["cluster_id"] for r in got_df.collect()}
        assert got == truth
    # empty edge set with string schema: empty-frame branch keeps the type
    empty = spark.createDataFrame([], "id_a string, id_b string")
    out = connected_components(empty, vertices=verts)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    assert {r["doc_id"]: r["cluster_id"] for r in out.collect()} == {
        f"url-{c}": f"url-{c}" for c in "abcdefg"
    }


def test_cc_executes_upstream_plan_once(spark):
    """VERDICT r3 #4: a bare connected_components() call on an uncached
    upstream plan must execute that plan exactly once — the sizing count
    reads internally checkpointed blocks, not the raw lineage."""
    acc = spark.sparkContext.accumulator(0)

    @F.udf("long")
    def tracked(x):
        acc.add(1)
        return x

    base = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["raw_a", "raw_b"]
    )
    edges = base.select(
        tracked("raw_a").alias("id_a"), F.col("raw_b").alias("id_b")
    )
    out = {
        r.doc_id: r.cluster_id for r in connected_components(edges).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert acc.value == 3, f"upstream plan ran {acc.value/3:.1f}x, want 1x"


def test_cc_precomputed_count_skips_sizing_job(spark):
    """Passing n_edges skips the sizing count entirely (and still picks
    the right path on both sides of the threshold)."""
    edges = spark.createDataFrame([(1, 2), (3, 4)], ["id_a", "id_b"])
    for n in (2, 5_000_000):
        out = {
            r.doc_id: r.cluster_id
            for r in connected_components(edges, n_edges=n).collect()
        }
        assert out == {1: 1, 2: 1, 3: 3, 4: 3}


def test_cc_stats_telemetry_both_paths(spark, random_graph):
    """Round-5: the optional ``stats`` out-dict records path, edge count,
    and iterations on both resolution paths (endurance-record telemetry)
    without affecting labels."""
    edges_df = spark.createDataFrame(random_graph, "id_a long, id_b long")
    want = _truth(random_graph)

    stats_drv: dict = {}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges_df, stats=stats_drv).collect()
    }
    assert got == want
    assert stats_drv["path"] == "driver"
    assert stats_drv["n_edges"] == len(random_graph)
    assert stats_drv["iterations"] >= 1

    stats_dist: dict = {}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            edges_df, driver_edge_threshold=0, stats=stats_dist
        ).collect()
    }
    assert got == want
    assert stats_dist["path"] == "distributed"
    assert stats_dist["iterations"] >= 1
    # fast path disabled → no sizing job ran, so n_edges is unknown
    assert stats_dist["n_edges"] is None

    # empty edge set: driver path, zero union-find passes
    empty = spark.createDataFrame([], "id_a long, id_b long")
    stats_empty: dict = {}
    assert connected_components(empty, stats=stats_empty).count() == 0
    assert stats_empty == {"path": "driver", "n_edges": 0, "iterations": 0}
