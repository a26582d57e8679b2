"""Round-13 operator families: seasonal decomposition, CUSUM
changepoint, OLS via sufficient statistics, KS two-sample, PSI drift,
all-pairs TF-IDF cosine, and the global_cummin prefix scan.

Value parity vs the DuckDB oracle is covered by the auto-enumerated
tests/test_oracle_parity.py; these tests pin the operator-level MATH
against numpy / hand-built inputs and the scale invariants
(partitioning independence, known-answer recovery on planted shifts).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from b2b_data_pipeline_indiamart_spark.operators.analytics import (
    ks_two_sample,
    ols_two_feature,
)
from b2b_data_pipeline_indiamart_spark.operators.profiling import psi_drift
from b2b_data_pipeline_indiamart_spark.operators.ranking import (
    global_cummin,
)
from b2b_data_pipeline_indiamart_spark.operators.temporal import (
    cusum_changepoint,
    seasonal_decompose_daily,
)
from b2b_data_pipeline_indiamart_spark.operators.textstats import (
    tfidf_allpairs,
)


# ---------------------------------------------------------------- cummin
def test_global_cummin_matches_running_min(spark):
    vals = [5, 3, 7, 3, -2, 8, -2, 10, 0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i INT, v LONG"
    ).repartition(4)
    out = {
        r["i"]: r["m"]
        for r in global_cummin(df, [F.col("i").asc()], "v", "m").collect()
    }
    run, expect = None, {}
    for i, v in enumerate(vals):
        run = v if run is None else min(run, v)
        expect[i] = run
    assert out == expect


def test_global_cummin_empty(spark):
    df = spark.createDataFrame([], "i INT, v LONG")
    assert global_cummin(df, [F.col("i").asc()], "v", "m").count() == 0


# ------------------------------------------------- seasonal decomposition
def test_seasonal_decompose_recovers_planted_weekly_pattern(spark):
    # 6 weeks of synthetic events: base 10/day + 5 extra on ISO dow 6
    # (Saturday), one event row per count unit.
    from datetime import date, timedelta

    rows = []
    eid = 0
    for d in range(42):
        dt = date(2024, 1, 1) + timedelta(days=d)
        day = dt.isoformat()
        dow = dt.isoweekday()
        n = 10 + (5 if dow == 6 else 0)
        for _ in range(n):
            rows.append((eid, f"{day} 12:00:00"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id LONG, ts STRING").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = seasonal_decompose_daily(ev)
    recs = {r["day"]: r for r in out.collect()}
    assert len(recs) == 42
    # edge days (first/last 3) have no trend
    assert recs["2024-01-01"]["trend"] is None
    assert recs["2024-02-11"]["trend"] is None
    sat = [r for r in recs.values() if r["dow_iso"] == 6]
    non_sat = [r for r in recs.values() if r["dow_iso"] != 6]
    # Saturday seasonal ≈ +5·6/7, others ≈ −5/7 (zero-mean effect)
    assert all(abs(r["seasonal"] - 5 * 6 / 7) < 0.05 for r in sat)
    assert all(abs(r["seasonal"] + 5 / 7) < 0.05 for r in non_sat)
    # interior residuals ≈ 0 for a perfectly periodic series
    interior = [r for r in recs.values() if r["resid"] is not None]
    assert interior and all(abs(r["resid"]) < 0.05 for r in interior)
    # partitioning invariance, bit-exact
    again = {
        r["day"]: r for r in seasonal_decompose_daily(ev.repartition(7)).collect()
    }
    assert {k: tuple(v) for k, v in recs.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_seasonal_decompose_gap_leaves_incomplete_windows_null(spark):
    # 14 days with day 8 missing: the ±3 windows that span the gap
    # must yield NULL trend (calendar-day, not row-offset, windows)
    rows = []
    eid = 0
    for d in range(14):
        if d == 7:
            continue
        for _ in range(10):
            rows.append((eid, f"2024-03-{d + 1:02d} 09:00:00"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id LONG, ts STRING").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    recs = {r["day"]: r for r in seasonal_decompose_daily(ev).collect()}
    assert recs["2024-03-05"]["trend"] is None  # window spans the gap
    assert recs["2024-03-12"]["trend"] is None


# ----------------------------------------------------------------- cusum
def test_cusum_flags_planted_level_shift(spark):
    # 30 days at 20 errors/day, then 15 days at 35/day: the CUSUM peak
    # must land on the LAST day (max drift accumulates to the end of a
    # sustained shift), and the stat must be ~0 before the shift.
    rows = []
    eid = 0
    for d in range(45):
        n = 20 if d < 30 else 35
        mo, dd = (1, d + 1) if d < 31 else (2, d - 30)
        for _ in range(n):
            rows.append((eid, f"2024-{mo:02d}-{dd:02d} 10:00:00", "error"))
            eid += 1
        rows.append((eid, f"2024-{mo:02d}-{dd:02d} 11:00:00", "click"))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts STRING, event_type STRING"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = sorted(cusum_changepoint(ev).collect(), key=lambda r: r["day"])
    assert len(out) == 45
    peak_days = [r["day"] for r in out if r["is_peak"] == 1]
    assert peak_days == ["2024-02-14"]
    # pre-shift stat stays small; post-shift it climbs monotonically
    pre = [r["cusum"] for r in out[:30]]
    post = [r["cusum"] for r in out[30:]]
    assert max(pre) < min(post[5:])
    assert post == sorted(post)


def test_cusum_partitioning_invariant(spark, sf_small):
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    a = sorted(map(tuple, cusum_changepoint(ev).collect()))
    b = sorted(map(tuple, cusum_changepoint(ev.repartition(11)).collect()))
    assert a == b


# ------------------------------------------------------------------- ols
def test_ols_matches_numpy_lstsq(spark):
    rng = np.random.default_rng(7)
    x1 = rng.integers(1, 50, 400).astype(float)
    x2 = np.round(rng.uniform(0, 0.1, 400), 2)
    y = np.round(3.0 + 25.0 * x1 - 40.0 * x2 + rng.normal(0, 5, 400), 2)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "q DOUBLE, d DOUBLE, p DOUBLE",
    )
    row = ols_two_feature(
        df, y_col="p", x1_col="q", x2_col="d", y_scale=2, x1_scale=0,
        x2_scale=2,
    ).collect()[0]
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row["n_rows"] == 400
    assert abs(row["intercept"] - beta[0]) < 1e-2
    assert abs(row["beta_x1"] - beta[1]) < 1e-3
    assert abs(row["beta_x2"] - beta[2]) < 1e-1  # tiny-range feature
    yhat = X @ beta
    r2 = 1 - ((y - yhat) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(row["r2"] - r2) < 1e-4


def test_ols_partitioning_invariant(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    a = ols_two_feature(
        li, "l_extendedprice", "l_quantity", "l_discount"
    ).collect()
    b = ols_two_feature(
        li.repartition(17), "l_extendedprice", "l_quantity", "l_discount"
    ).collect()
    assert list(map(tuple, a)) == list(map(tuple, b))


# -------------------------------------------------------------------- ks
def test_ks_identical_samples_zero(spark):
    rows = [(i % 100, "a") for i in range(500)] + [
        (i % 100, "b") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "v LONG, g STRING")
    r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert r["ks_d"] == 0.0
    assert r["p_value"] == 1.0


def test_ks_disjoint_samples_one(spark):
    rows = [(i, "a") for i in range(200)] + [
        (1000 + i, "b") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "v LONG, g STRING")
    r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert r["ks_d"] == 1.0
    assert r["p_value"] == 0.0
    assert (r["n_a"], r["n_b"]) == (200, 300)


def test_ks_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 60, 300)
    b = rng.integers(10, 80, 240)
    rows = [(int(v), "a") for v in a] + [(int(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v LONG, g STRING").repartition(9)
    r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    d = np.abs(fa - fb).max()
    assert abs(r["ks_d"] - d) < 1e-6


# ------------------------------------------------------------------- psi
def test_psi_identical_periods_near_zero(spark):
    rows = [(float(i % 200), "ref") for i in range(2000)] + [
        (float(i % 200), "cur") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "v DOUBLE, p STRING")
    out = psi_drift(df, "v", "p").collect()
    assert len(out) == 10
    assert all(abs(r["psi_total"]) < 1e-4 for r in out)


def test_psi_detects_planted_shift(spark):
    rng = np.random.default_rng(3)
    ref = rng.normal(100, 10, 3000)
    cur = rng.normal(130, 10, 3000)  # 3-sigma mean shift
    rows = [(float(v), "ref") for v in ref] + [
        (float(v), "cur") for v in cur
    ]
    df = spark.createDataFrame(rows, "v DOUBLE, p STRING")
    out = psi_drift(df, "v", "p").collect()
    total = out[0]["psi_total"]
    assert total > 0.25  # "significant shift" band
    assert all(r["psi_total"] == total for r in out)
    # per-bin contributions sum (in 1e-6 ints) to the total
    s = round(sum(round(r["psi_contrib"] * 1e6) for r in out) / 1e6, 6)
    assert abs(s - total) < 2e-6


# -------------------------------------------------------------- allpairs
def test_tfidf_allpairs_finds_planted_neardup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, base),
        (1, base.replace("delta", "lambda")),  # near-dup of 0
        (2, "completely different words entirely unrelated content here"),
        (3, "another unrelated document about other things altogether"),
        # extra docs so shared tokens clear the df>=2 floor
        (4, base.replace("alpha", "mu")),
        (5, "words content things other about unrelated"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = tfidf_allpairs(df, min_cos=0.5, top=10).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["cosine"] for r in out}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.7
    assert (0, 4) in pairs
    assert (2, 3) not in pairs  # unrelated docs stay below threshold


def test_tfidf_allpairs_df_cap_prunes_boilerplate(spark):
    # one token shared by ALL docs (df = N > 0.2·N floor→capped out):
    # with every other token unique (df=1, pruned), no pairs survive.
    docs = [(i, f"boiler unique{i}a unique{i}b") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = tfidf_allpairs(df, min_cos=0.1, top=100).collect()
    assert out == []


def test_tfidf_allpairs_partitioning_invariant(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    a = sorted(map(tuple, tfidf_allpairs(docs).collect()))
    b = sorted(
        map(tuple, tfidf_allpairs(docs.repartition(13)).collect())
    )
    assert a == b


# ----------------------------------------------------- containment
def _containment(spark, docs, **kw):
    from b2b_data_pipeline_indiamart_spark.operators.dedup import (
        shingle_containment,
    )

    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    return shingle_containment(df, **kw)


def test_containment_finds_quote_jaccard_misses(spark):
    quote = "the quick brown fox jumps over the lazy dog near the river"
    long_doc = (
        "completely unrelated preamble with many extra words here "
        + quote
        + " and then a very long tail of additional unrelated filler "
        "text that keeps going on and on diluting the union badly "
        "with yet more words and even more words after that too"
    )
    docs = [(0, quote), (1, long_doc), (2, "nothing in common at all")]
    out = _containment(spark, docs, min_shingles=10, min_containment=0.8)
    rows = {(r["doc_a"], r["doc_b"]): r["containment"] for r in out.collect()}
    # quote (A) is contained in long_doc (B): C(A→B) ≈ 1
    assert (0, 1) in rows and rows[(0, 1)] > 0.9
    # the reverse direction is NOT contained
    assert (1, 0) not in rows
    # exact Jaccard of the pair (same word-3gram space) is far below
    # the containment — the asymmetry is the point of the operator
    def grams3(t):
        w = t.lower().split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    g0, g1 = grams3(quote), grams3(long_doc)
    jac = len(g0 & g1) / len(g0 | g1)
    assert jac < 0.5


def test_containment_min_shingles_gate(spark):
    docs = [(0, "tiny text"), (1, "tiny text plus much more content here")]
    out = _containment(spark, docs, min_shingles=20, min_containment=0.5)
    # doc 0 has < 20 shingles: excluded as the contained side
    assert all(r["doc_a"] != 0 for r in out.collect())


def test_containment_df_cap_lower_bounds(spark):
    # a shingle shared by every doc is pruned by max_df; containment
    # computed over the remaining shingles only ever DROPS
    shared = "zzzz common prefix string "
    docs = [(i, shared + f"unique tail number {i} " * 3) for i in range(6)]
    full = _containment(
        spark, docs, min_shingles=5, min_containment=0.05, max_df=1000
    ).collect()
    capped = _containment(
        spark, docs, min_shingles=5, min_containment=0.05, max_df=3
    ).collect()
    f = {(r["doc_a"], r["doc_b"]): r["containment"] for r in full}
    c = {(r["doc_a"], r["doc_b"]): r["containment"] for r in capped}
    assert set(c) <= set(f)
    assert all(c[k] <= f[k] + 1e-9 for k in c)


# ----------------------------------------------- forecast backtest
def test_forecast_backtest_perfect_seasonal_series(spark):
    # monthly revenue that repeats exactly every 12 months:
    # seasonal-naive error = 0, naive error > 0
    from b2b_data_pipeline_indiamart_spark.operators.analytics import (
        forecast_backtest_monthly,
    )

    rows = []
    oid = 0
    for y in (1995, 1996, 1997):
        for m in range(1, 13):
            amount = 100.0 + 50.0 * (m % 3)  # within-year variation
            rows.append((oid, f"{y}-{m:02d}-15", amount))
            oid += 1
    df = spark.createDataFrame(
        rows, "o_orderkey LONG, o_orderdate STRING, o_totalprice DOUBLE"
    ).select(
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_totalprice",
    )
    out = {r["model"]: r for r in forecast_backtest_monthly(df).collect()}
    assert out["seasonal_naive"]["mae"] == 0.0
    assert out["seasonal_naive"]["smape"] == 0.0
    assert out["seasonal_naive"]["n_months"] == 24
    assert out["naive"]["n_months"] == 35
    assert out["naive"]["mae"] > 0


# --------------------------------------------------- control chart
def test_control_chart_flags_planted_excursion(spark):
    rows = []
    oid = 0
    for i in range(24):
        y, m = 1995 + i // 12, i % 12 + 1
        amount = 1000.0 + (9000.0 if i == 17 else 0.0)
        rows.append((oid, f"{y}-{m:02d}-10", amount))
        oid += 1
    df = spark.createDataFrame(
        rows, "o_orderkey LONG, o_orderdate STRING, o_totalprice DOUBLE"
    ).select(
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_totalprice",
    )
    from b2b_data_pipeline_indiamart_spark.operators.profiling import (
        control_chart_monthly,
    )

    out = {r["month"]: r for r in control_chart_monthly(df).collect()}
    assert len(out) == 24
    flagged = [m for m, r in out.items() if r["out_of_control"] == 1]
    assert flagged == ["1996-06"]
    assert out["1995-01"]["moving_range"] is None  # first month has no MR
    # limits are symmetric around the center
    r = out["1995-02"]
    assert abs((r["ucl"] - r["center"]) - (r["center"] - r["lcl"])) < 0.02


# ---------------------------------------------------------- wilson
def test_funnel_wilson_matches_closed_form(spark):
    # 100 users view; 60 click after view; 30 purchase after click
    rows = []
    for u in range(100):
        rows.append((u, "2024-01-01 10:00:00", "view"))
        if u < 60:
            rows.append((u, "2024-01-01 11:00:00", "click"))
        if u < 30:
            rows.append((u, "2024-01-01 12:00:00", "purchase"))
    df = spark.createDataFrame(
        rows, "user_id LONG, ts STRING, event_type STRING"
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    from b2b_data_pipeline_indiamart_spark.operators.analytics import (
        funnel_wilson,
    )

    out = {r["step"]: r for r in funnel_wilson(df).collect()}
    s1 = out["view_to_click"]
    assert (s1["n_prev"], s1["n_conv"]) == (100, 60)
    assert s1["rate"] == 0.6

    def wilson(k, n, z=1.96):
        p = k / n
        den = 1 + z * z / n
        c = (p + z * z / (2 * n)) / den
        h = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
        return c - h, c + h

    lo, hi = wilson(60, 100)
    assert abs(s1["ci_low"] - lo) < 1e-6 and abs(s1["ci_high"] - hi) < 1e-6
    s2 = out["click_to_purchase"]
    assert (s2["n_prev"], s2["n_conv"]) == (60, 30)
    assert s2["ci_low"] < 0.5 < s2["ci_high"]
