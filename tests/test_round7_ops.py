"""Round-7 regression tests: the four ADVICE-r6 fixes (auto-narrow
projection in global_ntile_many, Spark-dtype-driven accumulator in
global_cumsum, Hadoop-FS epoch ledger, fully-keyed pca reduce order)
plus pins for the operators added this round."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from b2b_data_pipeline_indiamart_spark.operators import caching, ranking


# ------------------------------------------- ntile_many auto-narrow


def test_global_ntile_many_derives_projection_from_string_order_cols(spark):
    """ADVICE r6: string order-cols need no `narrow` mapping — the
    projection is derived; previously this raised AnalysisException."""
    rows = [(i, float(i % 7), i % 5) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["k", "a", "b"]).repartition(4)
    got = ranking.global_ntile_many(
        df, 4, "k", {"qa": ["a", "k"], "qb": ["b", "k"]}
    )
    got_rows = sorted(
        map(tuple, got.select("k", "qa", "qb").collect())
    )
    caching.release_cached()
    chained = ranking.global_ntile(df, 4, ["a", "k"], "qa")
    chained = ranking.global_ntile(chained, 4, ["b", "k"], "qb")
    ref = sorted(map(tuple, chained.select("k", "qa", "qb").collect()))
    caching.release_cached()
    assert got_rows == ref


def test_global_ntile_many_expression_spec_falls_back_to_full_df(spark):
    """A Column-expression order spec with no narrow entry must not
    fail at plan time — it falls back to the full frame."""
    rows = [(i, float(i % 7)) for i in range(1, 41)]
    df = spark.createDataFrame(rows, ["k", "a"]).repartition(3)
    got = ranking.global_ntile_many(
        df, 4, "k", {"q": [F.col("a").desc(), F.col("k").asc()]}
    )
    got_rows = sorted(map(tuple, got.select("k", "q").collect()))
    caching.release_cached()
    ref = sorted(
        map(
            tuple,
            ranking.global_ntile(
                df, 4, [F.col("a").desc(), F.col("k").asc()], "q"
            )
            .select("k", "q")
            .collect(),
        )
    )
    caching.release_cached()
    assert got_rows == ref


# --------------------------------------------- cumsum decimal dtype


def test_global_cumsum_decimal_column(spark):
    """ADVICE r6: Decimal value columns accumulate as Decimal and the
    offsets frame carries the decimal type — no BIGINT schema clash."""
    from pyspark.sql import Window

    rows = [(i, Decimal(str(i)) / Decimal("4")) for i in range(1, 51)]
    df = spark.createDataFrame(rows, "k int, v decimal(10,2)").repartition(5)
    got = {
        r["k"]: r["c"]
        for r in ranking.global_cumsum(df, [F.col("k").asc()], "v", "c").collect()
    }
    caching.release_cached()
    w = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = {r["k"]: r["c"] for r in df.withColumn("c", F.sum("v").over(w)).collect()}
    assert got == ref
    assert all(isinstance(v, Decimal) for v in got.values())


def test_global_cumsum_integer_column_stays_exact(spark):
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 31)], "k int, v long"
    ).repartition(3)
    got = {
        r["k"]: r["c"]
        for r in ranking.global_cumsum(df, [F.col("k").asc()], "v", "c").collect()
    }
    caching.release_cached()
    assert got[30] == sum(i * 10 for i in range(1, 31))
    assert all(isinstance(v, int) for v in got.values())
