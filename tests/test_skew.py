from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from b2b_data_pipeline_indiamart_spark import catalog
from b2b_data_pipeline_indiamart_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark, sf_small):
    li = catalog.load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = catalog.load(spark, sf_small, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, ["l_orderkey"]).collect()
    salted = salted_join(li, orders, ["l_orderkey"], n_salts=8).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_left_join_keeps_unmatched_facts(spark):
    facts = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "x"])
    build = spark.createDataFrame([(1, "dim1")], ["k", "d"])
    rows = salted_join(facts, build, ["k"], n_salts=4, how="left").collect()
    got = {(r["k"], r["d"]) for r in rows}
    assert got == {(1, "dim1"), (2, None), (3, None)}
    assert len(rows) == 3  # build replication must not duplicate facts


def test_salted_join_spreads_hot_key(spark):
    # one key carries 90% of the rows; salted plan joins on (key, salt)
    facts = spark.createDataFrame(
        [(1 if i < 900 else i, float(i)) for i in range(1000)], ["k", "v"]
    )
    build = spark.createDataFrame([(i, f"d{i}") for i in range(1000)], ["k", "d"])
    out = salted_join(facts, build, ["k"], n_salts=8)
    assert out.count() == 1000
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    assert "__salt" in buf.getvalue()  # join condition includes the salt


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, ["id"], how="full")
