"""IO abstraction: parquet path mode round-trips (the sandbox mode), ref
classification, and catalog detection (no Iceberg jars here → empty)."""

import os

import pytest

from lsh_qd_spark.io import (
    is_path_ref,
    iceberg_catalogs,
    read_pages,
    read_stage,
    stage_exists,
    write_stage,
)


def test_ref_classification():
    assert is_path_ref("/tmp/x/documents.parquet")
    assert is_path_ref("rel/dir")
    assert is_path_ref("documents.parquet")
    assert not is_path_ref("iceberg.crawl.pages")
    assert not is_path_ref("pages")


def test_no_iceberg_catalog_in_sandbox(spark):
    assert iceberg_catalogs(spark) == []


def test_parquet_roundtrip_and_dynamic_overwrite(spark, tmp_path):
    ref = str(tmp_path / "stage")
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "doc_id long, epoch int"
    )
    assert not stage_exists(spark, ref)
    write_stage(df, ref, mode="overwrite", partition_by=["epoch"])
    assert stage_exists(spark, ref)
    assert read_stage(spark, ref).count() == 3
    # dynamic overwrite replaces only the partitions present in the frame
    repl = spark.createDataFrame([(9, 0)], "doc_id long, epoch int")
    write_stage(repl, ref, mode="dynamic_overwrite", partition_by=["epoch"])
    got = {
        (r["doc_id"], r["epoch"]) for r in read_stage(spark, ref).collect()
    }
    assert got == {(9, 0), (3, 1)}
    assert read_pages(spark, ref).count() == 2


class _WriterRecorder:
    """Stand-in for the DataFrameWriterV2 returned by df.writeTo — records
    the exact call sequence the catalog branch would issue to Iceberg."""

    def __init__(self, log):
        self.log = log

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", tuple(str(c) for c in cols)))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace",))

    def append(self):
        self.log.append(("append",))

    def overwritePartitions(self):
        self.log.append(("overwritePartitions",))


class _FakeDF:
    """Duck-typed DataFrame: only the writeTo entry point the catalog
    branch of write_stage touches."""

    def __init__(self):
        self.log = []

    def writeTo(self, ref):
        self.log.append(("writeTo", ref))
        return _WriterRecorder(self.log)


def test_catalog_branch_call_contract():
    """No Iceberg jar exists in-sandbox, so the production (catalog) branch
    of write_stage cannot run for real; this contract test pins the
    DataSourceV2 call sequence it issues for each mode (round-2 verdict
    item #9). If the branch ever changes, this fails before production does."""
    import pytest

    for mode, tail in [
        ("overwrite", ("createOrReplace",)),
        ("append", ("append",)),
        ("dynamic_overwrite", ("overwritePartitions",)),
    ]:
        df = _FakeDF()
        write_stage(df, "iceberg.crawl.stage", mode=mode)
        assert df.log == [("writeTo", "iceberg.crawl.stage"), tail]

    # partitioning precedes the terminal action
    df = _FakeDF()
    write_stage(
        df, "iceberg.crawl.stage", mode="overwrite", partition_by=["epoch", "shard"]
    )
    assert [c[0] for c in df.log] == [
        "writeTo",
        "partitionedBy",
        "createOrReplace",
    ]
    assert df.log[1][1] == ("Column<'epoch'>", "Column<'shard'>")

    with pytest.raises(ValueError, match="unknown write mode"):
        write_stage(_FakeDF(), "iceberg.crawl.stage", mode="upsert")


def test_compat_meta_layout_mismatch(tmp_path):
    """Layout knobs outside DedupConfig (n_shards: shard = pmod(hash,
    n_shards)) must gate compat too — a shard-count mismatch silently
    prunes/joins against the wrong partitions. Markers written before the
    layout key existed stay tolerated."""
    import pytest

    from lsh_qd_spark.io import check_compat_meta, write_compat_meta

    ref = str(tmp_path / "idx")
    write_compat_meta(ref, "h1", layout={"n_shards": 64})
    check_compat_meta(ref, "h1", layout={"n_shards": 64})  # same: fine
    check_compat_meta(ref, "h1")  # reader without layout claim: fine
    with pytest.raises(RuntimeError, match="n_shards 64 vs current 128"):
        check_compat_meta(ref, "h1", layout={"n_shards": 128})
    with pytest.raises(RuntimeError, match="config/kernel hash"):
        check_compat_meta(ref, "h2", layout={"n_shards": 64})
    # pre-layout marker (no n_shards recorded): tolerated, hash still gates
    write_compat_meta(ref, "h1")
    check_compat_meta(ref, "h1", layout={"n_shards": 128})
    with pytest.raises(RuntimeError):
        check_compat_meta(ref, "h2", layout={"n_shards": 128})


def test_compat_meta_require_marker(tmp_path):
    """Append paths pass require_marker=True when the index already holds
    data: an existing UNMARKED index has an unknown builder, so appending
    would mix band-key generations — and the appender's own marker write
    afterwards would stamp the mixed data as current. Read paths stay
    tolerant (pre-versioning indexes)."""
    import pytest

    from lsh_qd_spark.io import check_compat_meta, write_compat_meta

    ref = str(tmp_path / "idx")
    os.makedirs(ref)
    (tmp_path / "idx" / "part-0.parquet").write_bytes(b"")
    # read path: missing marker tolerated (documented)
    check_compat_meta(ref, "h1")
    # append path: missing marker is an error with a rebuild-or-stamp hint
    with pytest.raises(RuntimeError, match="no _compat_meta.json"):
        check_compat_meta(ref, "h1", require_marker=True)
    # once stamped, the append path passes
    write_compat_meta(ref, "h1")
    check_compat_meta(ref, "h1", require_marker=True)


def test_uri_path_helpers_via_hadoop_fs(spark, tmp_path):
    """file:// URIs exercise the Hadoop FileSystem branch — the same code
    path hdfs:// and s3a:// take in production, where driver-local os.path
    calls would silently report 'absent' and disable every
    existence-gated behavior."""
    from lsh_qd_spark.io import (
        check_compat_meta,
        list_child_names,
        path_exists,
        write_compat_meta,
    )

    base = f"file://{tmp_path}/idx"
    assert not path_exists(base, spark)
    write_compat_meta(base, "h1", layout={"n_shards": 8})
    assert path_exists(base, spark)
    assert "_compat_meta.json" in list_child_names(base, spark)
    check_compat_meta(base, "h1", layout={"n_shards": 8})  # compatible
    with pytest.raises(RuntimeError, match="incompatible"):
        check_compat_meta(base, "other-hash")
    with pytest.raises(RuntimeError, match="n_shards"):
        check_compat_meta(base, "h1", layout={"n_shards": 16})
    assert list_child_names(f"file://{tmp_path}/nope", spark) == []


def test_iceberg_catalogs_sees_runtime_conf(spark):
    """Catalogs registered AFTER session creation via spark.conf.set are
    valid (they resolve lazily) but never appear in the static SparkConf —
    iceberg_catalogs must read the runtime conf."""
    from lsh_qd_spark.io import iceberg_catalogs

    key = "spark.sql.catalog.rtcat"
    spark.conf.set(key, "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert "rtcat" in iceberg_catalogs(spark)
    finally:
        spark.conf.unset(key)
    assert "rtcat" not in iceberg_catalogs(spark)
