"""Local simulation of the driver's correctness gate: each __spark_entry__
queries() entry vs its oracle_sql() twin through DuckDB at sf0.01 —
row count, schema (column names), and order-insensitive exact values."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                ok = (
                    (isinstance(x, float) and isinstance(y, float))
                    and (x == y or (math.isnan(x) and math.isnan(y)))
                )
            else:
                ok = x == y
            assert ok, f"{name}: col {c} row {i}: {x!r} != {y!r}"


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(sql).df()
    _compare(name, spark_pdf, duck_pdf)


def test_all_queries_have_callables():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs


def test_every_query_has_an_oracle():
    """Round 2: no rows-only queries remain — every queries() entry has a
    DuckDB twin."""
    assert sorted(entrymod.queries().keys()) == ORACLE_NAMES


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) >= 2
