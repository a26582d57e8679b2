"""Local mirror of the driver's correctness gate (SURVEY.md §5.3).

For every registry entry with an oracle, run the Spark query AND the
DuckDB SQL on the same parquet tables and assert:

- identical column-name sets,
- identical row counts,
- identical values after (column-name-sorted, row-sorted) normalization
  — the same shape the driver hashes.

Floats are compared exactly after the registry's own rounding; a
mismatch here means the driver's hash would differ too.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from b2b_data_pipeline_indiamart_spark.catalog import TABLES
from b2b_data_pipeline_indiamart_spark.plans import ORACLE, QUERIES

SQL_KEYS = sorted(ORACLE)
ROWS_ONLY_KEYS = sorted(set(QUERIES) - set(ORACLE))


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # collapse -0.0 / 0.0 and fix float repr
        return repr(value + 0.0)
    if isinstance(value, int):
        return repr(value)
    return str(value)


def _rows_to_comparable(colnames, rows):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_normalize(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck_medium(sf_medium):
    con = _duck(sf_medium)
    yield con
    con.close()


@pytest.mark.parametrize("key", SQL_KEYS)
def test_oracle_parity(key, spark, sf_medium, duck_medium):
    sdf = QUERIES[key](spark, sf_medium)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck_medium.execute(ORACLE[key])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{key}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{key}: row count {len(spark_rows)} (spark) vs {len(duck_rows)} (duckdb)"
    )
    s_cmp = _rows_to_comparable(spark_cols, spark_rows)
    d_cmp = _rows_to_comparable(duck_cols, duck_rows)
    if s_cmp != d_cmp:
        diffs = [(a, b) for a, b in zip(s_cmp, d_cmp) if a != b][:5]
        raise AssertionError(f"{key}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(key, spark, sf_small):
    """Non-SQL-expressible ops at least run and return a stable schema."""
    sdf = QUERIES[key](spark, sf_small)
    rows = sdf.collect()
    assert isinstance(rows, list)
    assert len(sdf.columns) > 0
