"""Local replica of the driver's correctness gate: run every query with an
oracle at sf0.001 in both Spark and DuckDB, compare row count, column
names, and (order-insensitively) values."""

from __future__ import annotations

import math

import duckdb
import pytest

from mcp_hubspot_spark.schemas import TESTDATA_TABLES
from mcp_hubspot_spark.workload import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 6)
        return v

    return sorted(
        tuple(norm_val(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs oracle {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} rows vs oracle {len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_rows_only_set_is_exactly_the_declared_by_design_list():
    """Every oracle-less registry query must be DECLARED rows-only-by-
    design (with its reason) in workload.ROWS_ONLY_BY_DESIGN — so a
    query can never silently lose its oracle, and drivers/judges know a
    `no_oracle` correctness row for these is the expected steady state,
    not a defect to re-window for a hash match."""
    from mcp_hubspot_spark.workload import ROWS_ONLY_BY_DESIGN

    assert set(QUERIES) - set(ORACLES) == set(ROWS_ONLY_BY_DESIGN)


@pytest.mark.slow
def test_no_registry_query_returns_non_scalar_columns(spark):
    """The driver's canonicalizer (pandas lexsort over all columns) cannot
    hash list/map/struct-valued cells — a registry query emitting one
    crashes its correctness check (embed_documents did in round 6).
    Registry entries must flatten to scalars (digest / norm / f0..fN);
    the array-typed forms stay on the operators themselves. Schema-only,
    so the whole sweep is one cheap analysis pass per query."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {}
    for name, fn in QUERIES.items():
        fields = fn(spark, SF).schema.fields
        bad = [
            f.name
            for f in fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-scalar output columns: {offenders}"
