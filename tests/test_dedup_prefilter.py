"""The exact-dup collapse + MinHash-estimate prefilter are pure
performance rewrites: their outputs must equal the naive formulations
(full-corpus LSH candidates, no prefilter) at test scale factors."""

from __future__ import annotations

from pyspark.sql import functions as F

from b2b_data_pipeline_indiamart_spark import catalog
from b2b_data_pipeline_indiamart_spark.operators import dedup


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_exact_collapse_membership(spark, sf_small):
    docs = catalog.load(spark, sf_small, "documents")
    members = dedup.exact_collapse(docs)
    assert members.count() == docs.count()  # every doc mapped
    # rep_id is a member of its own group and the group minimum
    assert members.filter(F.col("rep_id") > F.col("doc_id")).count() == 0
    reps = members.filter(F.col("doc_id") == F.col("rep_id"))
    assert reps.count() == members.select("rep_id").distinct().count()
    # groups agree with exact_dedup_groups
    groups = dedup.exact_dedup_groups(docs)
    assert (
        _rows(members.groupBy("rep_id").count().orderBy("rep_id"))
        == _rows(groups.select("representative_id", "n_docs").orderBy("representative_id"))
    )


def test_ngram_jaccard_verified_matches_naive(spark, sf_small):
    docs = catalog.load(spark, sf_small, "documents")
    naive = dedup.ngram_jaccard_pairs(
        dedup.minhash_lsh_pairs(docs, k=64, bands=16), docs, threshold=0.3
    )
    fast = dedup.ngram_jaccard_verified(docs, k=64, bands=16, threshold=0.3)
    assert _rows(naive) == _rows(fast)
    # prefilter disabled (the registered configuration): same output
    no_pref = dedup.ngram_jaccard_verified(
        docs, k=64, bands=16, threshold=0.3, prefilter_factor=None
    )
    assert _rows(naive) == _rows(no_pref)


def test_minhash_estimate_bounds_and_exact_dups(spark, sf_small):
    docs = catalog.load(spark, sf_small, "documents")
    sigs = dedup.minhash_signatures(docs).persist()
    cand = dedup.lsh_candidate_pairs(sigs)
    est = dedup.minhash_estimate(cand, sigs).persist()
    assert est.count() == cand.count()
    # any LSH candidate agrees on >= one full band (4 of 64 minima)
    assert est.filter(F.col("est_jaccard") < 4 / 64).count() == 0
    assert est.filter(F.col("est_jaccard") > 1.0).count() == 0
    est.unpersist()
    sigs.unpersist()


def test_dedup_clusters_collapse_matches_uncollapsed(spark, sf_small):
    docs = catalog.load(spark, sf_small, "documents")
    # uncollapsed reconstruction: full-corpus LSH pairs → components
    pairs = dedup.minhash_lsh_pairs(docs)
    comps = dedup.connected_components(pairs)
    out = docs.select("doc_id").join(comps, F.col("doc_id") == comps.node, "left")
    cluster = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    naive = out.select(
        F.col("doc_id"),
        cluster.alias("cluster_id"),
        (F.col("doc_id") == cluster).alias("is_representative"),
    )
    assert _rows(naive) == _rows(dedup.dedup_clusters(docs))


def test_lsh_banding_matches_theoretical_s_curve(spark):
    """The banding s-curve, pinned against theory: under MinHash,
    each signature coordinate of a pair with Jaccard s agrees with
    probability s, so LSH with b bands x r rows makes the pair a
    candidate with P = 1-(1-s^r)^b. Simulate pairs with EXACTLY that
    coordinate-agreement distribution (seeded) and require the
    observed candidate rate inside a 4-sigma + slack band of theory
    for low / mid / high similarity — the property that makes
    candidate generation O(corpus x bands) trustworthy: sub-threshold
    pairs are dropped by PROBABILITY, not by luck."""
    import numpy as np

    from b2b_data_pipeline_indiamart_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    k, bands = 64, 16
    r = k // bands
    rng = np.random.default_rng(42)
    n_pairs = 200
    for s in (0.2, 0.5, 0.8):
        rows = []
        for i in range(n_pairs):
            base = rng.integers(-(2**62), 2**62, size=k)
            agree = rng.random(k) < s
            partner = np.where(
                agree, base, rng.integers(-(2**62), 2**62, size=k)
            )
            rows.append((2 * i, *[int(x) for x in base]))
            rows.append((2 * i + 1, *[int(x) for x in partner]))
        sigs = spark.createDataFrame(
            rows,
            "doc_id long, " + ", ".join(f"mh_{j} long" for j in range(k)),
        )
        cand = {
            (row["id_a"], row["id_b"])
            for row in lsh_candidate_pairs(sigs, k=k, bands=bands).collect()
        }
        hits = sum(1 for i in range(n_pairs) if (2 * i, 2 * i + 1) in cand)
        observed = hits / n_pairs
        theory = 1.0 - (1.0 - s**r) ** bands
        sigma = (theory * (1 - theory) / n_pairs) ** 0.5
        assert abs(observed - theory) <= 4 * sigma + 0.03, (
            s, observed, theory
        )
        # unrelated docs must essentially never collide (64-bit bands)
        strays = len(cand) - hits
        assert strays <= 2, strays


def test_lsh_bucket_cap_drops_megacluster_keeps_selective_pairs(spark):
    """max_bucket_size (the 100 TB quadratic-fanout guard): buckets
    larger than the cap are dropped before the self-join, so a
    mega-cluster of identical boilerplate stops emitting m^2/2 pairs,
    while pairs carried by small (selective) buckets survive. The
    default cap (LSH_MAX_BUCKET_DEFAULT=4096, VERDICT r11 #2) is far
    above every bucket here, so the default equals the exact output;
    the registry keys pass None explicitly for structural pinning."""
    boiler = "standard licence header " * 20
    uniq_a = ("a very long and quite specific passage about volcanic "
              "geology and the crystallization of basalt columns in "
              "iceland during long winters " * 4)
    uniq_b = uniq_a.replace("winters", "summers")
    rows = [(i, boiler) for i in range(10)]  # mega-cluster: 45 pairs
    rows += [(100, uniq_a), (101, uniq_b)]   # one selective near-pair
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = dedup.minhash_signatures(docs).persist()

    full = _rows(dedup.lsh_candidate_pairs(sigs))
    assert (100, 101) in full
    assert sum(1 for a, b in full if a < 100 and b < 100) == 45

    capped = _rows(dedup.lsh_candidate_pairs(sigs, max_bucket_size=5))
    # the 10-doc buckets exceed the cap -> all boilerplate pairs gone
    assert all(not (a < 100 and b < 100) for a, b in capped)
    # the 2-doc buckets are under the cap -> the selective pair stays
    assert (100, 101) in capped

    # cap above every bucket size == exact output
    assert _rows(dedup.lsh_candidate_pairs(sigs, max_bucket_size=100)) == full
    sigs.unpersist()


def test_lsh_default_cap_is_on_and_drop_is_observable(spark):
    """VERDICT r11 #2: the PUBLIC API defaults to a production-safe
    bucket cap — a degenerate bucket larger than
    LSH_MAX_BUCKET_DEFAULT is dropped WITHOUT any opt-in — and the
    drop is observable through the optional Observation (a silent
    coverage cap would read as 'covered everything')."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    k, bands = 64, 16
    assert dedup.LSH_MAX_BUCKET_DEFAULT == 4096
    n_degen = dedup.LSH_MAX_BUCKET_DEFAULT + 4
    # synthesize signatures directly (signature math is pinned
    # elsewhere): n_degen docs share one signature -> one bucket of
    # n_degen in EVERY band; two extra docs share a different
    # signature -> selective 2-doc buckets
    sig_cols = ", ".join(f"mh_{j} long" for j in range(k))
    degen = spark.range(n_degen).select(
        F.col("id").alias("doc_id"),
        *[F.lit(7).alias(f"mh_{j}") for j in range(k)],
    )
    pair = spark.createDataFrame(
        [(1_000_000, *[11] * k), (1_000_001, *[11] * k)],
        f"doc_id long, {sig_cols}",
    )
    sigs = degen.unionByName(pair)

    obs = Observation("lsh_drops")
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(
            sigs, k=k, bands=bands, observation=obs
        ).collect()
    }
    # default cap ON: the degenerate bucket's ~8.4M pairs are gone,
    # the selective pair survives
    assert got == {(1_000_000, 1_000_001)}
    m = obs.get
    assert m["lsh_buckets_total"] == 2 * bands
    assert m["lsh_buckets_dropped"] == bands
    assert m["lsh_band_rows_dropped"] == bands * n_degen

    # explicit None disables the cap (the registry pinning path):
    # spot-check on a SMALL degenerate set so the pair count is sane
    small = spark.range(6).select(
        F.col("id").alias("doc_id"),
        *[F.lit(7).alias(f"mh_{j}") for j in range(k)],
    )
    uncapped = dedup.lsh_candidate_pairs(
        small, k=k, bands=bands, max_bucket_size=None
    )
    assert uncapped.count() == 15  # 6*5/2


def test_lsh_observation_without_cap_fails_fast(spark):
    """ADVICE r12: an Observation is only wired into the plan by the
    cap's bucket-count aggregate — passing one with the cap disabled
    must fail at the call, not leave observation.get blocking far
    from the cause."""
    import pytest
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    sigs = spark.range(2).select(
        F.col("id").alias("doc_id"),
        *[F.lit(7).alias(f"mh_{j}") for j in range(64)],
    )
    with pytest.raises(ValueError, match="observation requires"):
        dedup.lsh_candidate_pairs(
            sigs, max_bucket_size=None, observation=Observation("x")
        )
