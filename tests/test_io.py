"""IO abstraction: parquet path mode round-trips (the sandbox mode), ref
classification, and catalog detection (no Iceberg jars here → empty)."""

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
