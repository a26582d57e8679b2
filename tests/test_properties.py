"""Property-based tests (hypothesis) for the parity-critical pieces:
the engine-portable rounding must agree with the DuckDB-side rewrite on
arbitrary doubles, and the text/price expressions must be idempotent /
total on arbitrary inputs."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from b2b_data_pipeline_indiamart_spark.functions.rounding import (
    floorize_round_sql,
    round_half_up,
)
from b2b_data_pipeline_indiamart_spark.functions.text import clean_text

SLOW = settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

FINITE = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@SLOW
@given(values=st.lists(FINITE, min_size=1, max_size=40), scale=st.integers(0, 4))
def test_round_half_up_matches_duckdb_rewrite(spark, values, scale):
    """Spark round_half_up(x, n) == the floorized SQL on DuckDB, for the
    same doubles — the invariant the whole oracle gate leans on."""
    df = spark.createDataFrame([(v,) for v in values], ["x"]).coalesce(1)
    got = [
        r["y"] for r in df.select(round_half_up(F.col("x"), scale).alias("y")).collect()
    ]
    con = duckdb.connect()
    sql = floorize_round_sql(f"SELECT round(x, {scale}) AS y FROM t ORDER BY rowid")
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want = [r[0] for r in con.execute(sql).fetchall()]
    con.close()
    assert got == want


@SLOW
@given(texts=st.lists(st.text(max_size=60), min_size=1, max_size=20))
def test_clean_text_total_and_idempotent(spark, texts):
    """clean_text never throws on arbitrary unicode and is idempotent:
    cleaning a cleaned value changes nothing."""
    df = spark.createDataFrame([(t,) for t in texts], ["x"]).coalesce(1)
    once = df.select(clean_text(F.col("x")).alias("y"))
    twice = once.select(clean_text(F.col("y")).alias("y"))
    assert [r["y"] for r in once.collect()] == [r["y"] for r in twice.collect()]


@SLOW
@given(
    amount=st.integers(0, 10**9),
    unit=st.sampled_from(["Piece", "Set", "Unit", "Pair", "Kg"]),
)
def test_price_roundtrip(spark, amount, unit):
    """Formatting a price the IndiaMART way and parsing it back recovers
    the number and the unit (etl.py:109-126 semantics)."""
    from b2b_data_pipeline_indiamart_spark.functions.prices import (
        parse_price_number,
        parse_price_unit,
    )

    raw = f"₹ {amount:,}/{unit}"
    df = spark.createDataFrame([(raw,)], ["x"]).coalesce(1)
    row = df.select(
        parse_price_number(F.col("x")).alias("n"),
        parse_price_unit(F.col("x")).alias("u"),
    ).collect()[0]
    assert row["n"] == float(amount)
    assert row["u"] == unit


@pytest.mark.parametrize("bad", ["", " ", "Ask Price", "Get Quote", "call us"])
def test_price_unparseable_is_null(spark, bad):
    from b2b_data_pipeline_indiamart_spark.functions.prices import parse_price_number

    df = spark.createDataFrame([(bad,)], ["x"])
    assert df.select(parse_price_number(F.col("x")).alias("n")).collect()[0]["n"] is None
