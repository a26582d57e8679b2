"""Round-8 operator pins: triangle census, OLS trend, Kaplan–Meier,
Benford, l-diversity, BM25 — hand-computed fixtures next to each key's
oracle gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from b2b_data_pipeline_indiamart_spark.plans import QUERIES


# ------------------------------------------------------------ triangles


def test_triangle_stats_hand_graph(spark):
    """K4 minus one edge: nodes {1,2,3,4}, edges 12 13 14 23 24 —
    exactly 2 triangles (123, 124); degrees 3,3,2,2 → wedges
    3+3+1+1 = 8; transitivity 6/8 = 0.75."""
    from b2b_data_pipeline_indiamart_spark.operators.graph import (
        triangle_stats,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "a long, b long"
    )
    [r] = triangle_stats(pairs).collect()
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (
        4, 5, 8, 2,
    )
    assert r["global_clustering"] == 0.75


def test_triangle_stats_triangle_free_and_skew(spark):
    """A star graph (max skew) has zero triangles and C(n,2) wedges at
    the hub; the degree ordering must not crash or overcount."""
    from b2b_data_pipeline_indiamart_spark.operators.graph import (
        triangle_stats,
    )

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "a long, b long"
    )
    [r] = triangle_stats(pairs).collect()
    assert (r["n_triangles"], r["n_wedges"]) == (0, 21)
    assert r["global_clustering"] == 0.0


# ------------------------------------------------------------ OLS trend


def test_nation_revenue_trend_matches_numpy(spark, sf_small):
    import numpy as np

    rows = QUERIES["nation_revenue_trend"](spark, sf_small).collect()
    assert len(rows) > 0
    # recompute one nation's slope independently from the raw tables
    import duckdb

    con = duckdb.connect()
    nm = rows[0]["n_name"]
    xy = con.execute(f"""
        SELECT CAST(datediff('month', DATE '1995-01-01',
                    date_trunc('month', o_orderdate)) AS DOUBLE) AS x,
               round(sum(o_totalprice), 2) AS y
        FROM read_parquet('{sf_small}/orders.parquet') o
        JOIN read_parquet('{sf_small}/customer.parquet') c ON o_custkey = c_custkey
        JOIN read_parquet('{sf_small}/nation.parquet') n ON c_nationkey = n_nationkey
        WHERE n_name = '{nm}' GROUP BY 1
    """).fetchall()
    x = np.array([a for a, _ in xy]); y = np.array([b for _, b in xy])
    slope, intercept = np.polyfit(x, y, 1)
    got = next(r for r in rows if r["n_name"] == nm)
    assert abs(got["slope"] - round(slope, 2)) <= 0.02
    assert abs(got["intercept"] - round(intercept, 2)) <= 0.02


# ------------------------------------------------------------ KM survival


def test_km_survival_hand_computed(spark, tmp_path):
    """5 customers: lifetimes (buckets) 0,0,1,2,2 — events at horizon
    except one censored. Classic product-limit hand-check."""
    import os

    rows = []
    # horizon = 2000-12-31; craft per-customer (first,last) orders
    data = [
        (1, "2000-01-01", "2000-01-10"),   # t=0, churned (last << horizon)
        (2, "2000-02-01", "2000-02-20"),   # t=0, churned
        (3, "2000-03-01", "2000-04-15"),   # t=1, churned
        (4, "2000-05-01", "2000-07-05"),   # t=2, churned
        (5, "2000-11-01", "2000-12-31"),   # t=2 (60d), censored (last=horizon)
    ]
    recs = []
    ok = 0
    for cid, f, l in data:
        recs.append((ok, cid, f)); ok += 1
        recs.append((ok, cid, l)); ok += 1
    df = spark.createDataFrame(
        recs, "o_orderkey long, o_custkey long, o_orderdate string"
    ).select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "orders.parquet"))
    out = {r["t_bucket"]: r for r in QUERIES["customer_survival_km"](spark, d).collect()}
    # t=0: n=5, d=2 -> S=0.6 ; t=1: n=3, d=1 -> 0.6*(2/3)=0.4
    # t=2: n=2, d=1 (cust 4), censored 1 (cust 5) -> 0.4*(1/2)=0.2
    assert (out[0]["n_at_risk"], out[0]["n_events"]) == (5, 2)
    assert out[0]["survival"] == 0.6
    assert (out[1]["n_at_risk"], out[1]["n_events"]) == (3, 1)
    assert out[1]["survival"] == 0.4
    assert (out[2]["n_at_risk"], out[2]["n_events"], out[2]["n_censored"]) == (2, 1, 1)
    assert out[2]["survival"] == 0.2


# ------------------------------------------------------------ Benford


def test_benford_digit_extraction_and_spine(spark, sf_small):
    rows = QUERIES["orders_benford_audit"](spark, sf_small).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["expected_share"] for r in rows) - 1.0) < 1e-3
    assert all(r["abs_deviation"] >= 0 for r in rows)


# ------------------------------------------------------------ l-diversity


def test_l_diversity_hand_computed(spark):
    from b2b_data_pipeline_indiamart_spark.operators.sampling import (
        l_diversity_report,
    )

    df = spark.createDataFrame(
        [
            ("a", "x"), ("a", "x"), ("a", "y"),    # group a: 2 values < 3
            ("b", "x"), ("b", "y"), ("b", "z"),    # group b: 3 values, ok
            ("c", None), ("c", "x"), ("c", "y"),   # NULL counts: 3 values, ok
        ],
        "q string, s string",
    )
    [r] = l_diversity_report(df, ["q"], "s", l=3).collect()
    assert (r["n_rows"], r["n_groups"], r["n_nondiverse_groups"]) == (9, 3, 1)
    assert (r["n_exposed_rows"], r["exposed_row_share"]) == (3, 0.3333)


# ------------------------------------------------------------ BM25


def test_bm25_rare_term_outranks_common(spark, sf_small):
    """Sanity: ranks are 1..20, scores non-increasing, and every
    top-20 doc actually contains a query term."""
    rows = QUERIES["docs_bm25_topk"](spark, sf_small).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_idf_is_lucene_form(spark):
    """A term present in every doc still gets a POSITIVE idf under the
    Lucene +1 form (plain Robertson idf would go negative/zero and
    flip rankings)."""
    n, dfreq = 10, 10
    assert math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0) > 0


def test_triangle_stats_sliced_closure_matches_unsliced(spark, monkeypatch):
    """Round 13: above the broadcast gate, a wedge stream larger than
    the slice budget closes in deterministic src-hash slices — the
    bounded-local-disk execution of the SAME plan. Force both gates
    tiny so a hand-checkable graph runs the sliced path, and pin the
    result equal to the normal (broadcast, unsliced) run."""
    from b2b_data_pipeline_indiamart_spark.operators import caching, graph

    # K5 plus a pendant: C(5,3)=10 triangles
    nodes = range(5)
    edges = [(a, b) for a in nodes for b in nodes if a < b] + [(4, 99)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    [want] = graph.triangle_stats(pairs).collect()
    caching.release_cached()
    assert want["n_triangles"] == 10

    monkeypatch.setattr(graph, "_TRIANGLE_BROADCAST_EDGE_CAP", 0)
    monkeypatch.setattr(graph, "_TRIANGLE_WEDGE_SLICE_ROWS", 3)
    [got] = graph.triangle_stats(pairs).collect()
    caching.release_cached()
    assert tuple(got) == tuple(want)
