"""Round-9 operator pins: the dashboard API tail — filtered bucket
share, dropdown option lists, LIMIT/OFFSET pagination, top-states —
hand-checked invariants next to each key's oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from b2b_data_pipeline_indiamart_spark.plans import QUERIES


# --------------------------------------------------- filtered bucket share


def test_filtered_price_buckets_shares_sum_to_100(spark, sf_small):
    rows = QUERIES["filtered_price_buckets"](spark, sf_small).collect()
    assert 1 <= len(rows) <= 4
    labels = {r["price_bucket"] for r in rows}
    assert labels <= {"Low (<10k)", "Mid (10k-50k)", "High (50k+)", "Unknown"}
    # shares are percentages of the FILTERED selection → sum to 100
    # (±rounding: 4 buckets × 0.005 each)
    assert abs(sum(r["share_pct"] for r in rows) - 100.0) <= 0.02
    assert all(r["cnt"] > 0 for r in rows)


def test_filtered_price_buckets_denominator_is_post_filter(spark, sf_small):
    """The share denominator must be the filtered total, not the whole
    table: counts across buckets equal the filtered join's row count."""
    rows = QUERIES["filtered_price_buckets"](spark, sf_small).collect()
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    cust = spark.read.parquet(f"{sf_small}/customer.parquet").filter(
        F.col("c_mktsegment") == "FURNITURE"
    )
    n = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    assert sum(r["cnt"] for r in rows) == n


# --------------------------------------------------------- dropdown lists


def test_dashboard_filters_lists_sorted_distinct_capped(spark, sf_small):
    rows = QUERIES["dashboard_filters"](spark, sf_small).collect()
    by_name: dict[str, list[str]] = {}
    for r in rows:
        by_name.setdefault(r["filter_name"], []).append(r["value"])
    assert set(by_name) == {"state", "keyword"}
    for name, vals in by_name.items():
        assert len(vals) <= 300
        assert len(set(vals)) == len(vals)  # distinct
        assert vals == sorted(vals)  # collected in sorted order
        assert all(v and v.lower() not in {"nan", "none", "null"} for v in vals)
    # segments are the 5 TPC-H market segments
    assert len(by_name["keyword"]) == 5


# ------------------------------------------------------------- pagination


def test_table_page_is_page_3_of_sorted_filtered_orders(spark, sf_small):
    rows = QUERIES["table_page"](spark, sf_small).collect()
    assert [r["page_row"] for r in rows] == list(range(41, 61))
    # keys strictly increasing (total order by o_orderkey)
    keys = [r["o_orderkey"] for r in rows]
    assert keys == sorted(keys) and len(set(keys)) == 20
    # independent recompute of the same page
    ref = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .orderBy("o_orderkey")
        .limit(60)
        .collect()
    )[40:]
    assert [r["o_orderkey"] for r in ref] == keys
    # total_rows constant on every row and equals the filtered count
    n = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert {r["total_rows"] for r in rows} == {n}


def test_table_page_deterministic(spark, sf_small):
    a = [tuple(r) for r in QUERIES["table_page"](spark, sf_small).collect()]
    b = [tuple(r) for r in QUERIES["table_page"](spark, sf_small).collect()]
    assert a == b and len(a) == 20


# ------------------------------------------------------------- top states


def test_filtered_top_states_counts_match_manual(spark, sf_small):
    rows = QUERIES["filtered_top_states"](spark, sf_small).collect()
    assert 1 <= len(rows) <= 12
    # counts descending with group_value tiebreak
    pairs = [(-r["cnt"], r["group_value"]) for r in rows]
    assert pairs == sorted(pairs)
    cust = spark.read.parquet(f"{sf_small}/customer.parquet").filter(
        F.col("c_mktsegment") == "HOUSEHOLD"
    )
    nation = spark.read.parquet(f"{sf_small}/nation.parquet")
    region = spark.read.parquet(f"{sf_small}/region.parquet")
    manual = {
        r["r_name"]: r["cnt"]
        for r in cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in rows:
        assert manual[r["group_value"]] == r["cnt"]
