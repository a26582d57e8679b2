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


# ------------------------------------------------- TPC-H completion trio


def test_q2_min_cost_rows_are_the_per_part_minimum(spark, sf_small):
    rows = QUERIES["q2_min_cost_supplier"](spark, sf_small).collect()
    # every returned (part, supplier) pair carries the minimum rounded
    # unit cost among European suppliers for that part
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_small}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_small}/nation.parquet")
    region = spark.read.parquet(f"{sf_small}/region.parquet")
    eu_keys = {
        r["s_suppkey"]
        for r in supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .collect()
    }
    costs: dict[tuple, list] = {}
    for r in (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias("c"))
        .collect()
    ):
        if r["l_suppkey"] in eu_keys:
            costs.setdefault(r["l_partkey"], []).append(round(r["c"], 4))
    for r in rows:
        assert r["unit_cost"] == round(min(costs[r["p_partkey"]]), 2)


def test_q4_counts_match_manual_exists(spark, sf_small):
    rows = {
        r["o_orderpriority"]: r["order_count"]
        for r in QUERIES["q4_priority_check"](spark, sf_small).collect()
    }
    orders = spark.read.parquet(f"{sf_small}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    late_orders = {
        r["l_orderkey"]
        for r in li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.datediff("l_shipdate", "o_orderdate") > 90)
        .collect()
    }
    manual: dict[str, int] = {}
    for r in orders.collect():
        if r["o_orderkey"] in late_orders:
            manual[r["o_orderpriority"]] = manual.get(r["o_orderpriority"], 0) + 1
    assert rows == manual and len(rows) > 0


def test_q20_dominance_threshold_is_strict_half(spark, sf_small):
    """The reported supplier set is EXACTLY the suppliers who shipped
    > 50% of some audited-brand part's 1995 volume (suppliers at 100%
    of a single-supplier part qualify: 1.0 > 0.5)."""
    rows = QUERIES["q20_excess_suppliers"](spark, sf_small).collect()
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    parts = {
        r["p_partkey"]
        for r in spark.read.parquet(f"{sf_small}/part.parquet")
        .filter(
            F.col("p_brand").isin(
                "Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5"
            )
        )
        .collect()
    }
    agg: dict[tuple, float] = {}
    tot: dict[int, float] = {}
    for r in li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("q")
    ).collect():
        if r["l_partkey"] in parts:
            agg[(r["l_partkey"], r["l_suppkey"])] = r["q"]
            tot[r["l_partkey"]] = tot.get(r["l_partkey"], 0.0) + r["q"]
    dominant_supps = {
        sk for (pk, sk), q in agg.items() if q > 0.5 * tot[pk]
    }
    emitted = {r["s_suppkey"] for r in rows}
    assert emitted == dominant_supps and len(emitted) > 0


# --------------------------------------------------- edit-distance dedup


def test_editdist_neardup_pairs_verified_by_python(spark, sf_small):
    """Every emitted pair's distance equals Python's DP edit distance
    on the normalized texts, and sim >= 0.8."""
    rows = QUERIES["docs_editdist_neardup"](spark, sf_small).collect()
    import re

    texts = {
        r["doc_id"]: re.sub(r"\s+", " ", r["text"]).strip().lower()
        for r in spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for r in rows:
        a, b = texts[r["doc_a"]], texts[r["doc_b"]]
        assert r["edit_dist"] == lev(a, b)
        assert r["sim"] >= 0.8
        assert r["doc_a"] < r["doc_b"]
        # blocked pairs share the 32-char normalized prefix
        assert a[:32] == b[:32]


def test_editdist_hot_block_cap_skips_large_blocks(spark):
    """A block larger than max_block contributes NO pairs (the
    hot-block guard), while a 2-doc block still verifies."""
    from b2b_data_pipeline_indiamart_spark.operators.dedup import (
        editdist_neardup_pairs,
    )

    base = "x" * 40
    rows = [(i, base + f" tail {i}") for i in range(5)]  # hot block of 5
    rows += [(100, "y" * 40 + " a"), (101, "y" * 40 + " b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = editdist_neardup_pairs(docs, max_block=4, min_sim=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {(100, 101)}


# ----------------------------------------------------------- cohort LTV


def test_cohort_ltv_triangle_invariants(spark, sf_small):
    rows = QUERIES["customer_cohort_ltv"](spark, sf_small).collect()
    assert len(rows) > 0
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_month"], []).append(r)
    for cm, rs in by_cohort.items():
        rs.sort(key=lambda r: r["month_offset"])
        # offset 0 exists (every member's first order is offset 0)
        assert rs[0]["month_offset"] == 0
        # cohort size = offset-0 actives >= any later month's actives
        n0 = rs[0]["n_active"]
        assert all(r["n_active"] <= n0 for r in rs)
        # cum_ltv is nondecreasing (revenue >= 0 per cell)
        ltvs = [r["cum_ltv"] for r in rs]
        assert all(b >= a - 1e-9 for a, b in zip(ltvs, ltvs[1:]))
        # first cell: cum_ltv == revenue / n0 (±1 cent: the engine
        # rounds half-up, Python's round() is banker's)
        assert abs(ltvs[0] - rs[0]["revenue"] / n0) <= 0.011


def test_cohort_ltv_conserves_total_revenue(spark, sf_small):
    """Triangle cells partition the order table: cell revenues sum to
    total order revenue (to cent rounding)."""
    rows = QUERIES["customer_cohort_ltv"](spark, sf_small).collect()
    total = sum(r["revenue"] for r in rows)
    ref = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .agg(F.sum("o_totalprice").alias("t"))
        .collect()[0]["t"]
    )
    assert abs(total - ref) <= 0.01 * len(rows)


# ------------------------------------------------------- skew diagnostics


def test_key_skew_report_uniform_vs_hot_key(spark):
    from b2b_data_pipeline_indiamart_spark.operators.skew import (
        key_skew_report,
    )

    uniform = spark.createDataFrame(
        [(i % 10,) for i in range(1000)], "k long"
    )
    [r] = key_skew_report(uniform, "k").collect()
    assert (r["n_keys"], r["n_rows"], r["max_sz"]) == (10, 1000, 100)
    assert r["skew_ratio"] == 1.0 and r["p50_sz"] == 100.0

    hot = spark.createDataFrame(
        [(0,)] * 991 + [(i,) for i in range(1, 10)], "k long"
    )
    [r] = key_skew_report(hot, "k").collect()
    assert r["max_sz"] == 991 and r["skew_ratio"] > 9
    assert r["max_share"] == 0.991


def test_orders_key_skew_report_consistency(spark, sf_small):
    [r] = QUERIES["orders_key_skew_report"](spark, sf_small).collect()
    n = spark.read.parquet(f"{sf_small}/orders.parquet").count()
    assert r["n_rows"] == n
    assert r["p50_sz"] <= r["p99_sz"] <= r["max_sz"]
    assert abs(r["mean_sz"] - n / r["n_keys"]) < 0.001


# ------------------------------------------------- similarity histogram


def test_embedding_sim_histogram_accounts_for_all_pairs(spark, sf_small):
    rows = QUERIES["embedding_sim_histogram"](spark, sf_small).collect()
    assert len(rows) >= 1
    # bins are 0.05-wide, bin_low = sim_bin * 0.05
    for r in rows:
        assert abs(r["bin_low"] - r["sim_bin"] * 0.05) < 1e-9
        assert -1.0 <= r["avg_sim"] <= 1.0
        # avg of the bin lies inside the bin (right edge inclusive due
        # to 4dp pre-rounding)
        assert r["bin_low"] - 1e-9 <= r["avg_sim"] <= r["bin_low"] + 0.05 + 1e-9
    # total pair count == C(sample, 2)
    import hashlib

    ids = [
        r["vec_id"]
        for r in spark.read.parquet(f"{sf_small}/embeddings.parquet").collect()
    ]
    sample = [
        i for i in ids
        if hashlib.md5(f"simhist:{i}".encode()).hexdigest()[:8] < "66666666"
    ]
    n = len(sample)
    assert sum(r["cnt"] for r in rows) == n * (n - 1) // 2


# ----------------------------------------------------- per-window top-k


def test_events_hourly_topk_rank_and_counts(spark, sf_small):
    rows = QUERIES["events_hourly_topk"](spark, sf_small).collect()
    assert len(rows) > 0
    by_hour: dict[str, list] = {}
    for r in rows:
        by_hour.setdefault(r["bucket_start"], []).append(r)
    for h, rs in by_hour.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        # counts non-increasing down the ranks
        cnts = [r["cnt"] for r in rs]
        assert cnts == sorted(cnts, reverse=True)


def test_events_hourly_topk_plan_uses_window_group_limit(spark, sf_small):
    df = QUERIES["events_hourly_topk"](spark, sf_small)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in phys


# ------------------------------------------------------------ DP release


def test_dp_lang_counts_noise_properties(spark, sf_small):
    import math

    rows = QUERIES["docs_dp_lang_counts"](spark, sf_small).collect()
    assert len(rows) >= 2
    for r in rows:
        # dp_n = true_n + noise (to output rounding)
        assert abs(r["dp_n"] - (r["true_n"] + r["noise"])) <= 0.001
        # Laplace(1) tail: |noise| beyond ~ln(2/delta) is astronomically
        # unlikely under the derived-uniform construction; assert the
        # inverse-CDF range bound for an 8-hex uniform (u >= 2^-33)
        assert abs(r["noise"]) <= -math.log(2 ** -33) + 1.0
    # deterministic: same seed string -> identical release on re-run
    again = QUERIES["docs_dp_lang_counts"](spark, sf_small).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


# ------------------------------------------------- portable simhash twin


def test_simhash_portable_tracks_similarity(spark):
    """Identical texts get identical 32-bit signatures; a one-word edit
    stays within a small hamming distance; unrelated texts are far."""
    from b2b_data_pipeline_indiamart_spark.operators.dedup import (
        simhash32_portable,
    )

    base = "the quick brown fox jumps over the lazy dog " * 5
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, base.replace("lazy", "sleepy")),
            (4, "completely different words about spark shuffles " * 5),
        ],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r["simhash"] for r in simhash32_portable(docs).collect()}
    assert sig[1] == sig[2]
    assert all(0 <= s < 2 ** 32 for s in sig.values())
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sig[1], sig[3]) <= 10
    assert ham(sig[1], sig[4]) > 5


def test_minhash_portable_estimates_jaccard(spark):
    """Signature agreement rate between two near-identical docs is far
    above two unrelated docs (MinHash's collision-probability =
    Jaccard identity, at k=16 granularity)."""
    from b2b_data_pipeline_indiamart_spark.operators.dedup import (
        minhash_portable,
    )

    base = "spark shuffles partition data across executors " * 6
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra tail"),
            (3, "totally unrelated content about gardening tools " * 6),
        ],
        "doc_id long, text string",
    )
    sig: dict[tuple, int] = {}
    for r in minhash_portable(docs).collect():
        sig[(r["doc_id"], r["perm"])] = r["minhash"]
    assert len(sig) == 48  # 3 docs x 16 perms
    agree_12 = sum(sig[(1, p)] == sig[(2, p)] for p in range(16))
    agree_13 = sum(sig[(1, p)] == sig[(3, p)] for p in range(16))
    assert agree_12 >= 10 and agree_13 <= 3


def test_lsh_buckets_portable_matches_operator_signature(spark, sf_small):
    """The portable key's buckets ARE hyperplane_signature's output at
    (8 planes, seed 42) — no drift between the key and the operator."""
    from pyspark.sql import functions as SF

    from b2b_data_pipeline_indiamart_spark.operators.similarity import (
        hyperplane_signature,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    ref = {
        r["vec_id"]: r["sig"]
        for r in emb.select(
            "vec_id",
            hyperplane_signature(SF.col("embedding"), 64, 8, 42).alias("sig"),
        ).collect()
    }
    got = {
        r["vec_id"]: r["bucket"]
        for r in QUERIES["embedding_lsh_buckets_portable"](
            spark, sf_small
        ).collect()
    }
    assert got == ref
    assert all(0 <= b < 256 for b in got.values())


# ------------------------------------------------------ sketch merging


def test_cms_cells_merge_by_counter_addition(spark):
    """The CMS mergeability contract: sketching two shards and ADDING
    their counters cell-wise equals sketching the union — the property
    that lets per-executor/per-day sketches roll up without rescans."""
    from b2b_data_pipeline_indiamart_spark.operators.sketches import (
        cms_cells,
    )

    rows = [(i % 37,) for i in range(500)] + [(999,)] * 50
    half1 = spark.createDataFrame(rows[:275], "k long")
    half2 = spark.createDataFrame(rows[275:], "k long")
    whole = spark.createDataFrame(rows, "k long")

    def cells(df):
        return {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_cells(df, "k", depth=4, width=64).collect()
        }

    c1, c2, cw = cells(half1), cells(half2), cells(whole)
    merged: dict[tuple, int] = dict(c1)
    for k, v in c2.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == cw


def test_hll_registers_merge_by_max(spark):
    """The HLL mergeability contract: max-combining two shards'
    registers equals the whole-input registers — per-shard sketches
    roll up without rescans, the same property the CMS test above pins
    for counter addition."""
    from b2b_data_pipeline_indiamart_spark.operators.sketches import (
        hll_registers,
    )

    rows = [("g", i % 211) for i in range(400)] + [("h", i) for i in range(90)]
    half1 = spark.createDataFrame(rows[:245], "g string, k long")
    half2 = spark.createDataFrame(rows[245:], "g string, k long")
    whole = spark.createDataFrame(rows, "g string, k long")

    def regs(df):
        return {
            (r["__g"], r["__reg"]): r["__mx"]
            for r in hll_registers(df, "g", "k").collect()
        }

    r1, r2, rw = regs(half1), regs(half2), regs(whole)
    merged: dict[tuple, int] = dict(r1)
    for k, v in r2.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == rw


def test_hll_portable_estimate_tracks_cardinality(spark):
    """The 4dp estimate is deterministic and orders with true
    cardinality across well-separated group sizes (no small-range
    correction by design, so only ORDER is asserted, not error)."""
    from b2b_data_pipeline_indiamart_spark.operators.sketches import (
        hll_cardinality_portable,
    )

    rows = (
        [("small", i) for i in range(40)]
        + [("mid", 1000 + i) for i in range(400)]
        + [("big", 10000 + i) for i in range(4000)]
    )
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    out = {
        r["event_type"]: r
        for r in hll_cardinality_portable(df, "event_type", "user_id").collect()
    }
    assert out["small"]["n_users_exact"] == 40
    assert out["big"]["n_users_exact"] == 4000
    assert (
        out["small"]["hll_est"] < out["mid"]["hll_est"] < out["big"]["hll_est"]
    )
    again = {
        r["event_type"]: r["hll_est"]
        for r in hll_cardinality_portable(df, "event_type", "user_id").collect()
    }
    assert again == {k: v["hll_est"] for k, v in out.items()}


def test_blocked_jaccard_pairs_exact_values(spark):
    """Identical texts score 1.0, disjoint texts 0.0, and a known
    half-overlap lands exactly — doc_ids chosen to share one md5-prefix
    block is not assumed; instead every pair is forced into one block
    by a tiny corpus (prefix floor 2 → collisions checked from output).
    """
    from b2b_data_pipeline_indiamart_spark.operators.dedup import (
        blocked_jaccard_pairs,
    )

    # brute force: find ids colliding on the 2-char md5 prefix so the
    # test controls pairing without touching the operator's blocking
    import hashlib

    by_pfx: dict[str, list[int]] = {}
    ids = []
    for i in range(3000):
        p = hashlib.md5(str(i).encode()).hexdigest()[:2]
        by_pfx.setdefault(p, []).append(i)
        if len(by_pfx[p]) == 3:
            ids = by_pfx[p]
            break
    assert len(ids) == 3
    rows = [
        (ids[0], "alpha beta gamma delta"),
        (ids[1], "alpha beta gamma delta"),  # identical → jaccard 1.0
        (ids[2], "zzzz qqqq wwww xxxx"),  # shares no 5-gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in blocked_jaccard_pairs(df).collect()
    }
    i0, i1, i2 = sorted(ids)
    assert out[(i0, i1)] in (0.0, 1.0)  # depends on which two ids match
    assert 1.0 in out.values()  # the identical pair scored 1.0
    assert sum(1 for v in out.values() if v == 0.0) == 2  # disjoint pairs


def test_weighted_sample_bottomk_favors_heavy_rows(spark):
    """Weight-8 rows should dominate a bottom-k draw over weight-1 rows
    (min of 8 uniforms beats min of 1 ~8/9 of the time), the draw is
    deterministic, and the sample never repeats an id."""
    from b2b_data_pipeline_indiamart_spark.operators.sampling import (
        weighted_sample_bottomk,
    )

    rows = [(i, 8 if i % 2 == 0 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w int")
    out = weighted_sample_bottomk(df, "id", "w", k=200).collect()
    assert len(out) == 200
    ids = [r["id"] for r in out]
    assert len(set(ids)) == 200
    heavy = sum(1 for r in out if r["weight"] == 8)
    # E[heavy] = 200 * 8/9 ≈ 178; assert well above the uniform 100
    assert heavy > 140
    again = [(r["id"], r["sample_key"]) for r in
             weighted_sample_bottomk(df, "id", "w", k=200).collect()]
    assert sorted(again) == sorted((r["id"], r["sample_key"]) for r in out)
    # partitioning-invariance: the drawn set is a pure function of ids
    shuffled = [(r["id"], r["sample_key"]) for r in
                weighted_sample_bottomk(df.repartition(7), "id", "w", k=200).collect()]
    assert sorted(shuffled) == sorted(again)


def test_embedding_cov_quantized_matches_numpy(spark):
    """The integer-sum covariance equals numpy's population covariance
    of the quantized values (exact arithmetic, then one float
    assembly)."""
    import numpy as np

    from b2b_data_pipeline_indiamart_spark.operators.similarity import (
        embedding_cov_quantized,
    )

    rng = [[(i * 7 + d * 3) % 11 / 7.0 - 0.6 for d in range(4)] for i in range(40)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id long, embedding array<double>"
    )
    out = {
        (r["i"], r["j"]): r["cov_q"]
        for r in embedding_cov_quantized(df, dim=4).collect()
    }
    q = np.floor(np.array(rng) * 1e6 + 0.5)
    cov = np.cov(q, rowvar=False, bias=True) / 1e12
    for (i, j), v in out.items():
        ref = np.floor(cov[i][j] * 1e6 + 0.5) / 1e6
        assert abs(v - ref) <= 1e-6, (i, j, v, ref)
    assert len(out) == 4 * 5 // 2


def test_dedup_within_window_invariants(spark):
    """Every kept row is the true (ts, id)-minimum of its group, group
    sizes sum back to the input count, and no (window, keys) group
    appears twice."""
    from datetime import datetime, timedelta

    from b2b_data_pipeline_indiamart_spark.operators.temporal import (
        dedup_within_window,
    )

    base = datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    for u in range(5):
        for k in range(40):
            rows.append((eid, base + timedelta(seconds=7 * k), u, "click"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = dedup_within_window(df, window_sec=60).collect()
    groups = [(r["window_start_epoch"], r["user_id"], r["event_type"]) for r in out]
    assert len(groups) == len(set(groups))
    assert sum(r["n_events"] for r in out) == len(rows)
    # recompute expected minima in plain python
    expect = {}
    for e, ts, u, t in rows:
        w = int(ts.timestamp() // 60) * 60
        key = (w, u, t)
        if key not in expect or (ts, e) < expect[key]:
            expect[key] = (ts, e)
    for r in out:
        key = (r["window_start_epoch"], r["user_id"], r["event_type"])
        assert r["kept_event_id"] == expect[key][1], key
