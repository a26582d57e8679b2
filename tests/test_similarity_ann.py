from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from b2b_data_pipeline_indiamart_spark import catalog
from b2b_data_pipeline_indiamart_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    df = catalog.load(spark, sf_small, "embeddings")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5)


@pytest.fixture(scope="module")
def exact_topk(emb, queries):
    rows = similarity.brute_force_topk(emb, queries, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return by_q


def _contract(df):
    assert df.columns == ["query_id", "neighbor_id", "cos_sim", "rnk"]


def test_ivf_contract_and_determinism(emb, queries):
    out = similarity.ann_ivf_topk(emb, queries, dim=64, k=10, n_cells=16, n_probe=4)
    _contract(out)
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            similarity.ann_ivf_topk(
                emb.repartition(5), queries, dim=64, k=10, n_cells=16, n_probe=4
            ).collect(),
        )
    )
    assert a == b  # stable across partitionings AND re-runs
    per_q = {}
    for qid, *_ in a:
        per_q[qid] = per_q.get(qid, 0) + 1
    assert all(n <= 10 for n in per_q.values())


def test_ivf_recall_beats_probe_floor(emb, queries, exact_topk):
    rows = similarity.ann_ivf_topk(
        emb, queries, dim=64, k=10, n_cells=8, n_probe=4
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # probing half the cells on clustered-ish data should recover a
    # meaningful share of the exact top-10 (loose floor: flaky-proof)
    hits = sum(len(got.get(q, set()) & exact) for q, exact in exact_topk.items())
    total = sum(len(v) for v in exact_topk.values())
    assert hits / total >= 0.3, f"IVF recall {hits}/{total}"


def test_neardup_blocked_matches_catalyst_pairs(emb):
    # the distributed block-pair gemm must reproduce the pure-Catalyst
    # pair join exactly (after the shared 4dp round), and be invariant
    # to the block count — blocking picks where a pair is scored, never
    # which pairs exist or their values
    small = emb.filter(F.col("vec_id") < 120)
    exact = sorted(
        map(tuple, similarity.cosine_neardup_pairs(small, threshold=0.3).collect())
    )
    for n_blocks in (1, 3, 8):
        blocked = sorted(
            map(
                tuple,
                similarity.cosine_neardup_blocked(
                    small, threshold=0.3, n_blocks=n_blocks
                ).collect(),
            )
        )
        assert blocked == exact, f"n_blocks={n_blocks}"


def test_neardup_blocked_is_fully_distributed():
    # the registered embedding_neardup path must not materialize the
    # corpus on the driver (no toPandas/collect/broadcast of the table)
    import inspect

    src = inspect.getsource(similarity.cosine_neardup_blocked)
    for forbidden in ("toPandas", ".collect(", "sparkContext.broadcast"):
        assert forbidden not in src, forbidden


def test_kmeans_centroids_deterministic(emb):
    c1 = similarity.kmeans_centroids(emb, dim=64, n_cells=8)
    c2 = similarity.kmeans_centroids(emb, dim=64, n_cells=8)
    assert c1 == c2
    assert len(c1) == 8 and len(c1[0]) == 64


def test_lsh_topk_subset_of_exact_scores(emb, queries, exact_topk):
    # LSH results are a subset of the candidate-restricted ranking —
    # sanity: the contract holds and every rnk run is 1..n consecutive
    out = similarity.ann_lsh_topk(emb, queries, dim=64, k=10, n_planes=8)
    _contract(out)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rnk"])
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))


def test_range_search_consistent_with_topk(emb, queries, exact_topk):
    """Every top-k neighbor whose score clears the radius must appear in
    the range result, and every range hit scores >= threshold."""
    thr = 0.3
    hits = similarity.cosine_range_search(emb, queries, threshold=thr).collect()
    by_q = {}
    for r in hits:
        assert r["cos_sim"] >= thr
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ranked = similarity.brute_force_topk(emb, queries, k=10).collect()
    for r in ranked:
        if r["cos_sim"] >= thr:
            assert r["neighbor_id"] in by_q.get(r["query_id"], set())


def test_range_search_zero_vector_excluded(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    q = df.filter(F.col("vec_id") == 0)
    out = similarity.cosine_range_search(df, q, threshold=0.5).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 1 not in ids  # zero-norm vector: NULL cosine, never a hit
    assert 2 in ids


def test_embedding_stats_partitioning_invariant(emb):
    a = sorted(map(tuple, similarity.embedding_stats(emb).collect()))
    b = sorted(map(tuple, similarity.embedding_stats(emb.repartition(7)).collect()))
    assert a == b
    assert all(r[1] > 0 for r in a)


def test_kmeans_distributed_path(emb):
    """Large-cap training path: distributed partial-sum Lloyd. Must be
    deterministic across runs, produce unit-norm centroids of the right
    shape, and assignment over them must populate multiple cells."""
    import math

    c1 = similarity.kmeans_centroids_distributed(emb, dim=64, n_cells=8, sample_cap=10_000)
    c2 = similarity.kmeans_centroids_distributed(emb, dim=64, n_cells=8, sample_cap=10_000)
    assert c1 == c2
    assert len(c1) == 8 and len(c1[0]) == 64
    for c in c1:
        assert math.isclose(sum(x * x for x in c) ** 0.5, 1.0, rel_tol=1e-9)
    cells = {r["cell"] for r in similarity.ivf_assign(emb, c1).select("cell").distinct().collect()}
    assert len(cells) >= 4


def test_kmeans_dispatch_default_cap_unchanged(emb):
    """Default cap stays on the driver-side numpy path — bit-identical
    to round-3 behavior; above DRIVER_SAMPLE_MAX the dispatch switches
    to the distributed trainer."""
    direct = similarity.kmeans_centroids(emb, dim=64, n_cells=8, sample_cap=4096)
    assert direct == similarity.kmeans_centroids(emb, dim=64, n_cells=8, sample_cap=4096)
    via_dispatch = similarity.kmeans_centroids(
        emb, dim=64, n_cells=8, sample_cap=similarity.DRIVER_SAMPLE_MAX + 1
    )
    dist = similarity.kmeans_centroids_distributed(
        emb, dim=64, n_cells=8, sample_cap=similarity.DRIVER_SAMPLE_MAX + 1
    )
    assert via_dispatch == dist


def test_kmeans_distributed_subsample_filter(emb):
    """sample_cap below corpus size must engage the deterministic
    hash-threshold filter and still train (no empty cells crash)."""
    c = similarity.kmeans_centroids_distributed(emb, dim=64, n_cells=4, sample_cap=100)
    assert len(c) == 4 and len(c[0]) == 64


def test_ann_rerank_recall_at_least_sq8(spark, sf_medium):
    """The exact re-rank can only improve on the raw SQ8 ranking:
    recall@10 vs exact must be >= the plain SQ8@10 recall, and the
    final ordering must be exactly the exact-cosine order within the
    shortlist."""
    from b2b_data_pipeline_indiamart_spark import catalog
    from b2b_data_pipeline_indiamart_spark.operators import similarity

    emb = catalog.load(spark, sf_medium, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    truth = {
        q: {r["neighbor_id"] for r in rows}
        for q, rows in _group(exact.collect()).items()
    }
    rer = _group(similarity.ann_rerank(emb, queries, k=10, shortlist=64).collect())
    sq8 = _group(similarity.ann_topk_sq8(emb, queries, k=10).collect())

    def recall(got):
        hits = total = 0
        for q, t in truth.items():
            g = {r["neighbor_id"] for r in got.get(q, [])}
            hits += len(g & t)
            total += len(t)
        return hits / total

    r_rerank, r_sq8 = recall(rer), recall(sq8)
    assert r_rerank >= r_sq8
    assert r_rerank >= 0.9
    # within each query the rerank output is sorted by exact cosine
    for q, rows in rer.items():
        sims = [r["cos_sim"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert sims == sorted(sims, reverse=True)


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(r)
    return out


def test_ann_matryoshka_recall_and_exact_order(spark, sf_medium):
    """Matryoshka two-stage (prefix-16 shortlist -> exact full-dim
    re-rank): recall@10 vs exact stays high (the 16-dim prefix of a
    64-dim embedding preserves coarse neighborhoods on this corpus),
    the final ordering is the exact-cosine order within the
    shortlist, and widening the shortlist can only raise recall —
    the monotonicity that makes shortlist size a pure recall/cost
    knob at 100 TB."""
    from b2b_data_pipeline_indiamart_spark import catalog
    from b2b_data_pipeline_indiamart_spark.operators import similarity

    emb = catalog.load(spark, sf_medium, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    truth = {
        q: {r["neighbor_id"] for r in rows}
        for q, rows in _group(exact.collect()).items()
    }

    def recall(got):
        hits = total = 0
        for q, t in truth.items():
            g = {r["neighbor_id"] for r in got.get(q, [])}
            hits += len(g & t)
            total += len(t)
        return hits / total

    mat64 = _group(
        similarity.ann_matryoshka(
            emb, queries, k=10, shortlist=64, prefix_dim=16
        ).collect()
    )
    r64 = recall(mat64)
    assert r64 >= 0.5, r64
    # exact-cosine order within every query's output
    for q, rows in mat64.items():
        sims = [r["cos_sim"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert sims == sorted(sims, reverse=True)
    # shortlist monotonicity: a wider shortlist never loses recall,
    # and at shortlist = corpus the result IS the exact top-k
    n = emb.count()
    r256 = recall(_group(
        similarity.ann_matryoshka(
            emb, queries, k=10, shortlist=256, prefix_dim=16
        ).collect()
    ))
    assert r256 >= r64
    full = _group(
        similarity.ann_matryoshka(
            emb, queries, k=10, shortlist=n, prefix_dim=16
        ).collect()
    )
    assert recall(full) == 1.0


def test_cluster_label_purity_seeded_hand_corpus(spark):
    """VERDICT r12 #3: the oracle-bearing purity twin — seeds are the
    n_seeds lowest-id vectors, assignment is argmax 6dp cosine with
    seed-id tie-break, readout is the shared _purity_readout path.
    Hand-checkable corpus: vec 0/1 are orthogonal seeds; 10,11 hug
    seed 0; 12 hugs seed 1; labels make cluster 0 purity 2/3."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),
            (1, [0.0, 1.0], 8),
            (10, [0.9, 0.1], 7),
            (11, [0.8, 0.05], 9),
            (12, [0.1, 0.9], 8),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    rows = {
        r["cluster"]: r
        for r in similarity.cluster_label_purity_seeded(
            emb, n_seeds=2
        ).collect()
    }
    assert set(rows) == {0, 1}
    c0, c1 = rows[0], rows[1]
    assert c0["n_vecs"] == 3 and c1["n_vecs"] == 2
    # cluster 0 members: labels 7,7,9 -> majority 7, purity 2/3
    assert c0["majority_label"] == 7 and abs(c0["purity"] - 0.6667) < 1e-9
    # cluster 1 members: labels 8,8 -> majority 8, purity 1.0
    assert c1["majority_label"] == 8 and c1["purity"] == 1.0
