"""Round-10 operator pins: t-digest-LITE twin accuracy/mergeability,
plus regression gates for the round's advice fixes."""

from __future__ import annotations

from pyspark.sql import functions as F

from b2b_data_pipeline_indiamart_spark.operators import sketches
from b2b_data_pipeline_indiamart_spark.plans import QUERIES


# ------------------------------------------------- t-digest-LITE twin


def test_tdigest_lite_tracks_exact_percentiles(spark, sf_small):
    """The digest estimate must sit within the widest centroid's span
    of the exact interpolated percentile. The codepoint grid's widest
    bucket is 15% of mass, so the estimate's rank error is <= 7.5% of
    n — translate that to a value bound via the exact p-band spread."""
    est = {
        r["p_brand"]: r
        for r in QUERIES["price_bands_tdigest_portable"](
            spark, sf_small
        ).collect()
    }
    part = spark.read.parquet(f"{sf_small}/part.parquet")
    for q, col in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.95, "p95")]:
        lo_q, hi_q = max(0.0, q - 0.08), min(1.0, q + 0.08)
        bounds = part.groupBy("p_brand").agg(
            F.expr(f"percentile(p_retailprice, {lo_q})").alias("lo"),
            F.expr(f"percentile(p_retailprice, {hi_q})").alias("hi"),
        ).collect()
        for r in bounds:
            v = est[r["p_brand"]][col]
            assert r["lo"] - 0.5 <= v <= r["hi"] + 0.5, (
                r["p_brand"], col, v, r["lo"], r["hi"])


def test_tdigest_lite_exact_on_singleton_centroids(spark):
    """A group smaller than the codepoint grid puts every value in its
    own centroid; the midpoint interpolation then reproduces rank
    statistics exactly at the centroid midpoints: for one value the
    digest must return that value at every quantile."""
    df = spark.createDataFrame([("g", 1, 42.37)], "g string, i int, x double")
    row = sketches.tdigest_lite_bands(df, "g", "x", "i").collect()[0]
    assert row["n_parts"] == 1 and row["n_centroids"] == 1
    for c in ("p25", "p50", "p75", "p95"):
        assert row[c] == 42.37


def test_tdigest_lite_partitioning_invariant(spark, sf_small):
    """Digest output must not depend on input partitioning (the
    driver's rows-only re-run property, kept for the twin too)."""
    part = spark.read.parquet(f"{sf_small}/part.parquet")
    a = sketches.tdigest_lite_bands(
        part, "p_brand", "p_retailprice", "p_partkey"
    ).collect()
    b = sketches.tdigest_lite_bands(
        part.repartition(13, "p_partkey"), "p_brand", "p_retailprice",
        "p_partkey",
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_tdigest_lite_centroid_weights_follow_codepoints(spark, sf_small):
    """Tail-adaptivity pin: with the frozen codepoint grid, the first/
    last centroids own ~1% of mass and the middle one ~15% — the
    K1-profile property the LITE digest exists to keep."""
    part = spark.read.parquet(f"{sf_small}/part.parquet")
    one = part.filter(F.col("p_brand") == part.select("p_brand").first()[0])
    n = one.count()
    if n < 100:
        return  # grid degenerate below 100 values; covered at sf0.01
    row = sketches.tdigest_lite_bands(
        one, "p_brand", "p_retailprice", "p_partkey"
    ).collect()[0]
    assert row["n_centroids"] >= 10


# ------------------------------------------- round-9 advice regressions


def test_key_skew_report_empty_frame_null_free(spark):
    """Empty-frame contract (ADVICE r9): counts coalesce to 0 and the
    ratios are 0.0, never NULL — matching k_anonymity/l_diversity's
    empty-frame behavior so report-comparing gates don't see NULLs."""
    from b2b_data_pipeline_indiamart_spark.operators.skew import (
        key_skew_report,
    )

    empty = spark.createDataFrame([], "k string, x int")
    [r] = key_skew_report(empty, "k").collect()
    assert r["n_keys"] == 0 and r["n_rows"] == 0
    assert r["mean_sz"] == 0.0 and r["p50_sz"] == 0.0
    assert r["p99_sz"] == 0.0 and r["max_sz"] == 0
    assert r["skew_ratio"] == 0.0 and r["max_share"] == 0.0
    assert all(v is not None for v in r.asDict().values())


def test_seeded_ann_twins_survive_sparse_ids(spark):
    """Seed selection is 'the n lowest-id vectors' via a bounded
    TakeOrdered, not ``id < n`` (ADVICE r9): a corpus whose ids are
    neither dense nor 0-based must still get a full seed set and
    non-degenerate results."""
    from b2b_data_pipeline_indiamart_spark.operators import similarity

    rows = [(1000 + 7 * i, [float((i * j) % 13) - 6.0 for j in range(64)])
            for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.orderBy("vec_id").limit(3)

    ivf = similarity.ann_ivf_seeded_topk(
        emb, queries, n_seeds=16, n_probe=4, k=5
    ).collect()
    assert len(ivf) > 0 and {r["query_id"] for r in ivf} == {1000, 1007, 1014}

    pq = similarity.ann_pq_seeded_topk(
        emb, queries, dim=64, m=16, n_seeds=16, k=5
    ).collect()
    assert len(pq) == 15  # 3 queries x top-5

    ivfpq = similarity.ann_ivfpq_seeded_topk(
        emb, queries, dim=64, m=16, n_seeds=16, n_probe=4, k=5
    ).collect()
    assert len(ivfpq) > 0


def test_plan_audit_window_spec_paren_depth():
    """_empty_window_specs must not truncate at a ')' inside a nested
    partition-key expression (ADVICE r9): a window partitioned by
    date_trunc(hour, ts) is NOT a global window."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.plan_audit import _empty_window_specs

    partitioned = (
        "windowspecdefinition(date_trunc(hour, ts#1), n#2 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))"
    )
    assert _empty_window_specs(partitioned) == 0
    global_w = (
        "windowspecdefinition(round(x#3, 2) ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))"
    )
    assert _empty_window_specs(global_w) == 1


def test_bpe_apply_matches_training_replay_on_full_cap(spark, sf_small):
    """VERDICT r9 task 6: the one text key with neither oracle nor twin
    is the BPE merge APPLICATION. Pin it with an INDEPENDENT driver
    replay of the TRAINING loop's merge application (in-order scan
    merge, the other of the two classic-BPE formulations) over the
    ENTIRE capped distinct-word table, then drive Spark's actual
    Arrow-UDF apply path (bpe_tokenize_docs) over the same words and
    pin its subword counts to the replay."""
    from pyspark.sql import functions as F

    from b2b_data_pipeline_indiamart_spark.operators.dedup import word_tokens
    from b2b_data_pipeline_indiamart_spark.operators.textstats import (
        bpe_segment,
        bpe_train_merges,
    )
    from b2b_data_pipeline_indiamart_spark.operators.textstats import (
        bpe_tokenize_docs,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    merges = bpe_train_merges(docs, n_merges=50)
    assert len(merges) == 50

    # the trainer's capped distinct-word table, rebuilt verbatim
    words = [
        r["tok"]
        for r in docs.select(word_tokens(F.col("text")).alias("__toks"))
        .select(F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("wf"))
        .filter(F.length("tok") >= 2)
        .orderBy(F.col("wf").desc(), F.col("tok").asc())
        .limit(65536)
        .collect()
    ]
    # the synthetic corpus has a small closed vocabulary — the point
    # is FULL-cap coverage, not cap size
    assert len(words) >= 20

    def train_replay(word: str) -> list[str]:
        # the TRAINING formulation: apply each merge in training order,
        # scanning left-to-right — independent of bpe_segment's
        # lowest-rank-present-first apply
        syms = [*word]
        for a, b in merges:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        return syms

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    expect = {}
    for w in words:
        replay = train_replay(w)
        assert bpe_segment(w, ranks) == replay, w
        expect[w] = len(replay)

    # Spark's actual apply path (Arrow pandas UDF on the word grain):
    # one doc per capped word -> n_subwords must equal the replay length
    word_docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        words[r["doc_id"]]: r["n_subwords"]
        for r in bpe_tokenize_docs(word_docs, merges).collect()
    }
    assert got == expect


def test_bpe_apply_matches_training_replay_synthetic_vocab(spark):
    """Same apply-vs-training pin over a denser synthetic vocabulary
    (syllable products: overlapping pairs, repeated substrings, shared
    prefixes — the merge-interaction cases a 30-word corpus misses)."""
    import itertools

    from b2b_data_pipeline_indiamart_spark.operators.textstats import (
        bpe_segment,
        bpe_train_merges,
    )

    syll = ["ba", "na", "to", "ri", "xe", "mu", "pla", "kro", "sti", "aa"]
    vocab = ["".join(p) for p in itertools.product(syll, repeat=2)]
    vocab += ["".join(p) for p in itertools.product(syll[:5], repeat=3)]
    # zipf-ish frequencies so merge ranking is non-trivial
    text = " ".join(w for i, w in enumerate(vocab) for _ in range(1 + i % 7))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe_train_merges(docs, n_merges=80)
    assert len(merges) == 80
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def train_replay(word: str) -> list[str]:
        syms = [*word]
        for a, b in merges:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        return syms

    for w in sorted(set(vocab)):
        assert bpe_segment(w, ranks) == train_replay(w), w


def test_session_stats_partitioning_invariant(spark, sf_medium):
    """r10 flake regression: events_session_stats once hash-missed in
    the full parity run because its float avg was summation-order
    sensitive at a 4dp rounding boundary. The means now reduce exact
    bigints (ms durations, integer cents) — the output must be
    bit-identical under any input partitioning."""
    from b2b_data_pipeline_indiamart_spark import catalog
    from b2b_data_pipeline_indiamart_spark.operators import temporal

    events = catalog.load(spark, sf_medium, "events")
    a = sorted(map(tuple, temporal.session_stats(events).collect()))
    for n in (3, 17, 64):
        b = sorted(
            map(
                tuple,
                temporal.session_stats(
                    events.repartition(n, "user_id")
                ).collect(),
            )
        )
        assert a == b, n


def test_exact_avg_null_handling_and_boundary_determinism(spark):
    """rounding.exact_avg contract: NULLs drop from sum AND count
    (like F.avg); a mean landing EXACTLY on a rounding boundary
    resolves identically under any partitioning (the r10 flake class
    it exists to kill: mean of 1 and 2 cents = 0.015 -> 0.02 under
    floor-based half-up, every time)."""
    from b2b_data_pipeline_indiamart_spark.functions.rounding import (
        exact_avg,
    )

    rows = [("a", 0.01), ("a", 0.02), ("a", None),
            ("b", 1.25), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "g string, x double")
    for n in (1, 3, 7):
        got = {
            r["g"]: r["m"]
            for r in df.repartition(n)
            .groupBy("g")
            .agg(exact_avg("x", 2).alias("m"))
            .collect()
        }
        assert got == {"a": 0.02, "b": 1.25}, (n, got)
    # out_scale above the quantization scale (the q1 avg_disc shape)
    [r] = (df.filter("g = 'a'")
           .agg(exact_avg("x", 2, 4).alias("m")).collect())
    assert r["m"] == 0.015
