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


# ------------------------------------------------ batch A: curation ops


def test_dsir_formula_hand_computed(spark):
    import math

    from b2b_data_pipeline_indiamart_spark.operators import textstats

    # corpus: target doc "a a", non-target doc "a b"
    # counts: a: c=3, ct=2; b: c=1, ct=0; V=2, N=4, Nt=2
    docs = spark.createDataFrame(
        [(1, "a a", "en"), (2, "a b", "de")], ["doc_id", "text", "lang"]
    )
    out = {
        r["doc_id"]: r
        for r in textstats.dsir_logratio(docs, F.col("lang") == "en").collect()
    }
    lr_a = math.log((2 + 1) / (2 + 2)) - math.log((3 + 1) / (4 + 2))
    lr_b = math.log((0 + 1) / (2 + 2)) - math.log((1 + 1) / (4 + 2))
    assert out[1]["is_target"] is True and out[2]["is_target"] is False
    assert out[1]["dsir_score"] == round(lr_a, 4)
    assert out[2]["dsir_score"] == round((lr_a + lr_b) / 2, 4)
    # the target-looking doc scores higher
    assert out[1]["dsir_score"] > out[2]["dsir_score"]


def test_bpe_pair_counts_hand_computed(spark):
    from b2b_data_pipeline_indiamart_spark.operators import textstats

    # "abab" x2 (pairs ab, ba, ab -> ab:2, ba:1 per occurrence),
    # "ab" x1 -> ab:1. weighted: ab = 2*2+1 = 5, ba = 1*2 = 2
    docs = spark.createDataFrame(
        [(1, "abab abab ab")], ["doc_id", "text"]
    )
    got = {r["pair"]: r["pair_count"] for r in
           textstats.bpe_pair_counts(docs, top_n=10).collect()}
    assert got == {"ab": 5, "ba": 2}


def test_readability_hand_computed(spark):
    from b2b_data_pipeline_indiamart_spark.operators import textstats

    # "see spot run. go!" -> words 4, sentences 2 (runs of [.!?]),
    # vowel groups: ee, o, u, o -> 4 syllables
    docs = spark.createDataFrame([(1, "see spot run. go!")], ["doc_id", "text"])
    [r] = textstats.readability(docs).collect()
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (4, 2, 4)
    expected = 206.835 - 1.015 * (4 / 2) - 84.6 * (4 / 4)
    assert r["flesch"] == round(expected, 2)


def test_readability_fragment_is_one_sentence(spark):
    from b2b_data_pipeline_indiamart_spark.operators import textstats

    docs = spark.createDataFrame([(1, "no punctuation here")], ["doc_id", "text"])
    [r] = textstats.readability(docs).collect()
    assert r["n_sentences"] == 1


def test_quality_logit_monotone_and_threshold(spark):
    from b2b_data_pipeline_indiamart_spark.operators import textstats

    long_clean = " ".join(["the quick brown fox jumps over the lazy dog"] * 10)
    noisy = "@@!! 123 456 $$%% 789 ##"
    docs = spark.createDataFrame(
        [(1, long_clean), (2, noisy)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in textstats.quality_logit(docs).collect()}
    assert out[1]["quality_prob"] > out[2]["quality_prob"]
    assert out[1]["keep"] is True and out[2]["keep"] is False
    # keep is exactly prob >= 0.5 on the rounded value
    for r in out.values():
        assert r["keep"] == (r["quality_prob"] >= 0.5)


# ------------------------------------------------ batch B: SemDeDup


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_semdedup_keep_rule_hand_computed(spark):
    from b2b_data_pipeline_indiamart_spark.operators import similarity

    # cluster 0: a=[1,0], b=[1,0.1], c=[0,1]; cos(a,b) ~ 0.995,
    # cos(a,c)=0, cos(b,c) ~ 0.0995 -> at 0.9: only b dropped.
    # cluster 1: d=[1,0] identical to a but different cluster -> kept.
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.1], 0),
        (3, [0.0, 1.0], 0),
        (4, [1.0, 0.0], 1),
    ]
    out = {
        r["vec_id"]: r["kept"]
        for r in similarity.semdedup(
            _emb_df(spark, rows), "label", threshold=0.9
        ).collect()
    }
    assert out == {1: True, 2: False, 3: True, 4: True}


def test_semdedup_exists_rule_is_not_transitive_closure(spark):
    from b2b_data_pipeline_indiamart_spark.operators import similarity

    # chain: a~b (cos ~0.982), b~c (~0.985), a~c (~0.935): at 0.95
    # b dropped (a below it), c dropped (b below it, even though b
    # itself was dropped) — the documented exists-based rule.
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.19], 0),
        (3, [1.0, 0.38], 0),
    ]
    out = {
        r["vec_id"]: r["kept"]
        for r in similarity.semdedup(
            _emb_df(spark, rows), "label", threshold=0.95
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False}


def test_semdedup_null_cluster_always_kept(spark):
    from b2b_data_pipeline_indiamart_spark.operators import similarity

    rows = [(1, [1.0, 0.0], None), (2, [1.0, 0.0], None)]
    out = {
        r["vec_id"]: r["kept"]
        for r in similarity.semdedup(
            _emb_df(spark, rows), "label", threshold=0.5
        ).collect()
    }
    assert out == {1: True, 2: True}


def test_semdedup_invariant_to_n_blocks(spark, sf_small):
    from b2b_data_pipeline_indiamart_spark import catalog
    from b2b_data_pipeline_indiamart_spark.operators import similarity

    emb = catalog.load(spark, sf_small, "embeddings")
    a = sorted(
        map(tuple, similarity.semdedup(emb, "label", threshold=0.3, n_blocks=2).collect())
    )
    b = sorted(
        map(tuple, similarity.semdedup(emb, "label", threshold=0.3, n_blocks=7).collect())
    )
    assert a == b


def test_semdedup_kmeans_deterministic_and_rule_consistent(spark, sf_small):
    from b2b_data_pipeline_indiamart_spark import catalog
    from b2b_data_pipeline_indiamart_spark.operators import similarity

    emb = catalog.load(spark, sf_small, "embeddings")
    r1 = similarity.semdedup_kmeans(emb, 64, n_clusters=8, threshold=0.3)
    rows1 = sorted(map(tuple, r1.collect()))
    rows2 = sorted(map(tuple, similarity.semdedup_kmeans(
        emb, 64, n_clusters=8, threshold=0.3).collect()))
    assert rows1 == rows2  # driver may re-run: must be deterministic
    # the keep rule must agree with semdedup() run on the SAME clusters
    clusters = spark.createDataFrame(
        [(v, c) for (v, c, _k) in rows1], "vec_id long, cl int"
    )
    joined = emb.join(clusters, "vec_id").select("vec_id", "embedding", "cl")
    ref = {
        r["vec_id"]: r["kept"]
        for r in similarity.semdedup(joined, "cl", threshold=0.3).collect()
    }
    assert {v: k for (v, _c, k) in rows1} == ref
    # it actually deduplicates something on the test corpus
    assert any(not k for (_v, _c, k) in rows1)
