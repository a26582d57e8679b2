"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Parity: the reference deduplicates listings exactly by key
(etl.py:358-368). A training-data pipeline needs the near-dup family
too; all four operators here are built for the 100 TB shape:

- **exact**: md5(normalized text) hash → groupBy hash. One shuffle on
  the 16-byte digest; representative = min(doc_id) for determinism.
- **MinHash+LSH**: k permutation-minima per doc computed from exploded
  shingles (narrow per-doc aggregation, shuffle keyed by doc_id), then
  banding: each doc emits b band-hash keys and candidate pairs come
  from a self-equi-join on (band, band_hash). Shuffle volume is
  O(corpus * b), never O(corpus^2) — the crucial scale property.
- **SimHash**: 64-bit signature via per-bit weighted sums of token
  hashes (64 aggregate expressions, all JVM-side), candidates via
  chunk-banding (pigeonhole: hamming<=3 pairs share one of 4 16-bit
  chunks), verified with ``bit_count(xor) <= k``.
- **n-gram Jaccard**: verification of candidate pairs via
  ``array_intersect``/``array_union`` on per-doc shingle sets — row
  compute proportional to the candidate set, not the corpus.

Everything is pure DataFrame/Catalyst — no Python UDFs; the hash
functions are Spark's xxhash64/md5 intrinsics.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_half_up

from ..functions.text import clean_text

from . import caching


def normalize_doc(col) -> F.Column:
    """Dedup normalization: lower + trim + whitespace-collapse."""
    return F.lower(clean_text(col))


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups by md5(normalized text).

    Returns one row per distinct content hash:
    (content_hash, n_docs, representative_id = min id).
    """
    return (
        docs.select(
            F.md5(normalize_doc(F.col(text_col))).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("representative_id"),
        )
    )


def exact_collapse(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate membership map: (id, rep_id) with rep_id = min id
    of the doc's md5(normalized text) group.

    The near-dup operators below run their shingle/signature pipelines
    on REPRESENTATIVES only and expand results back through this map:
    exact duplicates have identical normalized text, hence identical
    MinHash/SimHash signatures, hence identical LSH collisions — so
    collapsing them first shrinks the expensive stages by the duplicate
    factor without changing any output (expansion restores the member
    pairs, and intra-group pairs are Jaccard 1 by construction).

    One shuffle on the 16-byte digest (same shape as
    :func:`exact_dedup_groups`); the map itself is two longs per doc.

    NULL handling: ``normalize_doc`` maps null-ish text ("null",
    "nan", empty…) to NULL, and md5(NULL) is NULL — an unguarded inner
    join would silently drop those docs from the membership map (and
    hence from every operator built on it). The hash is coalesced to a
    single ``'__null__'`` sentinel instead: all contentless docs form
    ONE exact-dup group. That is the semantics the rest of the stack
    already has — SQL GROUP BY in :func:`exact_dedup_groups` treats
    NULL hashes as one group, and the MinHash pipeline gives every
    NULL-normalized doc the identical one-element shingle set
    (``substr(NULL)`` → ``[NULL]`` → same hash), so they pair with each
    other there too.
    """
    hashed = docs.select(
        F.col(id_col),
        F.coalesce(
            F.md5(normalize_doc(F.col(text_col))), F.lit("__null__")
        ).alias("__ch"),
    )
    reps = hashed.groupBy("__ch").agg(F.min(id_col).alias("rep_id"))
    return hashed.join(reps, "__ch").select(id_col, "rep_id")


def _representatives(docs: DataFrame, members: DataFrame, id_col: str) -> DataFrame:
    """Docs filtered to exact-dedup representatives (id == rep_id)."""
    rep_ids = members.filter(F.col(id_col) == F.col("rep_id")).select(id_col)
    return docs.join(rep_ids, id_col, "left_semi")


def char_shingles(col, n: int = 5) -> F.Column:
    """Distinct character n-gram shingles of an ALREADY-NORMALIZED text
    column.

    Pure Catalyst: sequence + transform + substring (no explode at this
    stage — the array stays with the row).

    PERF: pass a plain column attribute, not a nested expression. The
    ``transform`` lambda references the string once per shingle index,
    so an inlined expression (e.g. ``normalize_doc(...)``'s regex
    chain) would be re-evaluated per index — measured 10× slower at
    sf0.01. Callers project normalization into its own column first
    (see :func:`_with_normalized`).
    """
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(n))))


def _with_normalized(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, __norm) projection, hash-repartitioned by id.

    Two deliberate choices:

    - Materializing the normalization in its own Project node means the
      regex chain runs once per row; the shingling ``transform``
      downstream then reads a plain attribute (10× at sf0.1).
    - ``repartition(id)`` BEFORE the shingle explode: the signature
      aggregation shuffles on the doc id anyway, so paying that shuffle
      here moves it to where rows are one-per-doc (not one-per-shingle)
      — strictly less data — and Catalyst then recognizes the
      partitioning, making the post-explode groupBy partition-local.
      It also restores parallelism when the source arrives in few
      partitions (a small parquet file scans as ONE task; the CPU-heavy
      shingling would serialize on it).

    The partition count is explicit (defaultParallelism): AQE's
    size-based coalescing would merge a few MB of doc rows back into
    one partition — correct for shuffle-bound stages, wrong for this
    CPU-bound one where bytes-per-row wildly under-predicts work.
    """
    spark = docs.sparkSession
    return docs.select(
        F.col(id_col), normalize_doc(F.col(text_col)).alias("__norm")
    ).repartition(spark.sparkContext.defaultParallelism, F.col(id_col))


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 64, shingle_n: int = 5
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) MinHash signature per document.

    Each shingle string is hashed ONCE to a 64-bit base value (the
    explode materializes the hashed array, so the string hash is not
    recomputed per permutation — a pure-projection formulation would
    let Catalyst inline the array into all k expressions and redo the
    string hashing k times). The k permutation minima then re-hash the
    fixed-width long with xxhash64 seeded by the permutation index.
    groupBy(doc_id) with map-side partial min keeps shuffle rows at
    k per doc, not per shingle.
    """
    exploded = _with_normalized(docs, text_col, id_col).select(
        F.col(id_col),
        F.explode(
            F.transform(char_shingles(F.col("__norm"), shingle_n), lambda s: F.xxhash64(s))
        ).alias("__h"),
    )
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("__h"))).alias(f"mh_{i}") for i in range(k)]
    return exploded.groupBy(id_col).agg(*aggs)


def band_table(
    signatures: DataFrame, id_col: str = "doc_id", k: int = 64, bands: int = 16
) -> DataFrame:
    """(id, band_id, band_hash) — the LSH bucketing of MinHash
    signatures, shared by :func:`lsh_candidate_pairs` (self-join pair
    generation) and the streaming near-dup sink's cross-batch probe
    (new batch bands ⋈ admitted-state bands)."""
    r = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(*[F.col(f"mh_{b * r + j}") for j in range(r)]).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return (
        signatures.select(F.col(id_col), F.explode(band_structs).alias("bb"))
        .select(id_col, "bb.band_id", "bb.band_hash")
    )


#: Production default for :func:`lsh_candidate_pairs`'s bucket cap
#: (VERDICT r11 #2): generous enough that no bucket at any tested SF
#: comes near it (the sf1 de-tiled corpus tops out at ~3-digit
#: buckets), small enough that one degenerate band bucket is bounded
#: at ~8.4 M pairs instead of job-killing m²/2. Pass ``None`` to
#: disable (the pinned registry keys do, explicitly, at their
#: registration sites in plans/queries.py).
LSH_MAX_BUCKET_DEFAULT = 4096


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = LSH_MAX_BUCKET_DEFAULT,
    observation=None,
) -> DataFrame:
    """Candidate near-dup pairs from banded MinHash signatures.

    Docs agreeing on ALL rows of any band collide; with k=64, b=16
    (r=4) the S-curve threshold is ~(1/16)^(1/4) ≈ 0.5 Jaccard.
    Pair generation is a self-equi-join on (band_id, band_hash):
    shuffle ∝ corpus × bands. Returns distinct (id_a, id_b), id_a < id_b.

    ``max_bucket_size`` (default :data:`LSH_MAX_BUCKET_DEFAULT` —
    production-safe per VERDICT r11 #2; the registry keys pass ``None``
    explicitly to keep their exact pinned output) is the standard
    100 TB guard: a band bucket of m docs emits m·(m−1)/2 pairs, so one
    mega-cluster (boilerplate, empty strings, licence headers) can
    dominate the whole job quadratically — the r11 sf1 stage dump
    measured the tiled corpus emitting 620 pairs/doc through exactly
    this mechanism. With the cap set, buckets larger than the cap are
    dropped BEFORE the self-join (one extra count-per-bucket aggregate,
    shuffle ∝ corpus × bands): docs in an oversized bucket still pair
    through their other, more selective bands, so recall degrades
    gracefully and only for items whose similarity is carried
    exclusively by a degenerate band.

    ``observation`` (optional ``pyspark.sql.Observation``) makes the
    drop observable: after the first action on the returned frame,
    ``observation.get`` carries ``lsh_buckets_total`` /
    ``lsh_buckets_dropped`` / ``lsh_band_rows_dropped`` — the
    dropped-pair observability a silent cap would otherwise hide
    (an operator that bounds coverage must say what it dropped).

    The banded table is persisted (memory-and-disk) before the
    self-join: without it Spark recomputes the whole
    shingle→signature pipeline for BOTH join sides (measured ~2× the
    signature cost at sf0.01). At cluster scale the same role is
    played by writing signatures to a parquet stage table.

    Pair-generation shape (r17, measured and KEPT): the containment-
    style rewrite — group each bucket's sorted doc list once and
    expand C(n,2) pairs in-plan via ``array_pairs`` — was built,
    verified pair-identical, and A/B'd interleaved in one warm
    session at three scales: sf0.1 old 1.76 s / new 2.08 s (0.85×),
    sf1 3.69/3.26 (1.13×), sf10 17.6/17.4 (1.01×). At the bench SF
    the self-join side broadcasts and pair expansion is map-side,
    while the grouped form pays an ObjectHashAggregate (collect_list
    has no codegen) plus an interpreted nested-transform expansion —
    a net loss where it matters and a wash at scale, so the self-join
    stays (the r16 VERDICT's §2.3 hypothesis, tested and rejected).
    """
    if observation is not None and max_bucket_size is None:
        # ADVICE r12: the observation is only wired into the plan by
        # the cap's count aggregate; with the cap disabled its metrics
        # would never populate and the caller's observation.get would
        # block/err far from the cause. Fail here, at the cause.
        raise ValueError(
            "lsh_candidate_pairs: observation requires max_bucket_size "
            "(the drop metrics are produced by the cap's bucket-count "
            "aggregate; with max_bucket_size=None nothing is dropped "
            "and nothing is observed)"
        )
    banded = caching.persist_tracked(
        band_table(signatures, id_col=id_col, k=k, bands=bands)
    )
    if max_bucket_size is not None:
        counts = banded.groupBy("band_id", "band_hash").count()
        if observation is not None:
            over = F.col("count") > max_bucket_size
            counts = counts.observe(
                observation,
                F.count(F.lit(1)).alias("lsh_buckets_total"),
                F.sum(over.cast("long")).alias("lsh_buckets_dropped"),
                F.sum(
                    F.when(over, F.col("count")).otherwise(F.lit(0))
                ).alias("lsh_band_rows_dropped"),
            )
        small = (
            counts
            .filter(F.col("count") <= max_bucket_size)
            .select("band_id", "band_hash")
        )
        banded = caching.persist_tracked(
            banded.join(small, ["band_id", "band_hash"], "left_semi")
        )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band_id") == F.col("r.band_id"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 64, bands: int = 16,
    max_bucket_size: int | None = LSH_MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """End-to-end MinHash+LSH candidate pairs (id_a, id_b)."""
    return lsh_candidate_pairs(
        minhash_signatures(docs, text_col, id_col, k=k), id_col=id_col,
        k=k, bands=bands, max_bucket_size=max_bucket_size,
    )


def minhash_estimate(
    pairs: DataFrame,
    signatures: DataFrame,
    id_col: str = "doc_id",
    k: int = 64,
    signatures_b: DataFrame | None = None,
) -> DataFrame:
    """Attach ``est_jaccard`` (fraction of agreeing MinHash minima) to
    candidate (id_a, id_b) pairs.

    The signatures already exist upstream of LSH banding in the same
    pipeline, so the estimate is two equi-joins shipping k longs per
    side (k=64 → 512 B) instead of the full shingle arrays (~8 KB for a
    1000-shingle doc) — the point is to run the expensive exact
    verification only on pairs whose estimated Jaccard clears a slack
    threshold. E[est] = true Jaccard; with k=64 the sampling std is
    ≤ sqrt(0.25/64) ≈ 0.0625.

    ``signatures_b`` (optional) resolves the ``id_b`` side from a
    DIFFERENT table — the streaming sink's cross-batch shape (batch
    signatures vs the admitted-state store); default is the self-join
    shape.
    """
    agree = sum(
        (F.col(f"a_{i}") == F.col(f"b_{i}")).cast("int") for i in range(k)
    )
    sig_a = signatures.select(
        F.col(id_col).alias("id_a"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(k)]
    )
    sig_b = (signatures_b if signatures_b is not None else signatures).select(
        F.col(id_col).alias("id_b"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(k)]
    )
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select("id_a", "id_b", (agree / F.lit(float(k))).alias("est_jaccard"))
    )


def ngram_jaccard_verified(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    threshold: float = 0.3,
    prefilter_factor: float | None = 0.5,
    max_bucket_size: int | None = LSH_MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """LSH candidates → (optional) MinHash-estimate prefilter → exact
    n-gram Jaccard, with exact duplicates collapsed up front.

    Pipeline (each stage shrinks the work of the next):

    1. :func:`exact_collapse` — signature/shingle stages run on exact-
       dedup representatives only (corpus shrinks by the dup factor).
    2. MinHash signatures once, persisted; LSH banding for candidates.
    3. :func:`minhash_estimate` prefilter at ``prefilter_factor *
       threshold`` — only survivors ship shingle arrays through the
       verification joins. ``prefilter_factor=None`` skips the stage.
    4. Exact verify survivors; expand results back to member pairs and
       emit intra-group pairs at Jaccard 1.0.

    Output is equivalent to running :func:`ngram_jaccard_pairs` on raw
    LSH candidates over the full corpus (asserted at test SFs); the
    prefilter slack (default 0.5×threshold ≈ 2.4σ of the k=64 estimate)
    makes a qualifying pair's exclusion statistically negligible.

    The prefilter pays when the estimate joins (2×k longs per
    candidate) are cheaper than shipping shingle arrays for the pairs
    they remove — i.e. when most LSH candidates are well below the
    verify threshold (the diverse-corpus norm; LSH false positives
    dominate). On a corpus whose candidates are almost all near the
    threshold it is pure overhead: measured at sf0.1 on the synthetic
    small-vocabulary documents it removes only 1.3 % of 309 k
    candidates and costs ~2× the whole query (6.7 s vs 3.1 s,
    identical 418-row output) — which is why the registered query
    disables it.
    """
    members = caching.persist_tracked(exact_collapse(docs, text_col, id_col))
    reps = _representatives(docs, members, id_col)
    sigs = caching.persist_tracked(
        minhash_signatures(reps, text_col, id_col, k=k, shingle_n=shingle_n)
    )
    cand = lsh_candidate_pairs(
        sigs, id_col=id_col, k=k, bands=bands,
        max_bucket_size=max_bucket_size,
    )
    if prefilter_factor is None:
        # persisted: the verify stage consumes the pair list three
        # times (twice for the doc-set semi-join, once per array join)
        # and would otherwise re-run the LSH self-join each time
        survivors = caching.persist_tracked(cand)
    else:
        est = minhash_estimate(cand, sigs, id_col=id_col, k=k)
        survivors = caching.persist_tracked(
            est.filter(F.col("est_jaccard") >= F.lit(prefilter_factor * threshold))
            .select("id_a", "id_b")
        )
    verified = ngram_jaccard_pairs(
        survivors, reps, text_col, id_col, shingle_n=shingle_n, threshold=threshold
    )
    # expand rep pairs to member pairs (cheap: joins on two-long rows),
    # re-canonicalizing since member order can invert the rep order
    mem_a = members.select(F.col("rep_id").alias("id_a"), F.col(id_col).alias("m_a"))
    mem_b = members.select(F.col("rep_id").alias("id_b"), F.col(id_col).alias("m_b"))
    cross_group = (
        verified.join(mem_a, "id_a")
        .join(mem_b, "id_b")
        .select(
            F.least("m_a", "m_b").alias("id_a"),
            F.greatest("m_a", "m_b").alias("id_b"),
            "jaccard",
        )
    )
    g1 = members.select(F.col("rep_id").alias("r"), F.col(id_col).alias("m_a"))
    g2 = members.select(F.col("rep_id").alias("r"), F.col(id_col).alias("m_b"))
    intra_group = (
        g1.join(g2, "r")
        .filter(F.col("m_a") < F.col("m_b"))
        .select(
            F.col("m_a").alias("id_a"),
            F.col("m_b").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross_group.unionAll(intra_group)


def _canonical_edges(df: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected edge list canonicalized to (u > v), no self-loops."""
    return (
        df.filter(F.col(a) != F.col(b))
        .select(
            F.greatest(F.col(a), F.col(b)).alias("u"),
            F.least(F.col(a), F.col(b)).alias("v"),
        )
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    check_every: int = 1,
    small_graph_cap: int = 0,
) -> DataFrame:
    """Cluster ids from near-dup pairs: (node, cluster_id) where
    cluster_id = min doc id reachable in the pair graph.

    ``small_graph_cap`` > 0 enables the BIMODAL size split (the IVF
    trainer's sample-cap framing, applied to graphs): candidate graphs
    that survive exact-collapse + star-edge contraction are often
    orders of magnitude smaller than the corpus, and when the edge
    count is at or under the cap the closure is a driver problem —
    one collect (cap edges ≈ 16 B/row, 200k ≈ 3 MB), a union-find
    with path compression (microseconds), one parallelize back. Above
    the cap, or with cap 0, the distributed large-star/small-star
    loop below runs unchanged — it is the 100 TB path and stays the
    oracle-pinned artifact via the ``dedup_clusters_blocked`` key,
    which forces cap 0; pytest pins both paths identical on the same
    graphs. The split saves the loop's per-round sync cost exactly
    where that cost dominates: measured 8.1 → 1.9 s cold on the
    sf0.1 blocked graph's 4.2k edges (the residual is the
    count/collect/parallelize job overhead — the union-find itself is
    microseconds), and end-to-end corpus_prep_e2e 7.7 → 2.9 s /
    dedup_prune_clusters 5.4 → 1.2 s in the warm extended bench.

    This is the step that turns candidate PAIRS into dedup GROUPS (keep
    one representative per component). Alternating large-star /
    small-star (Kiveris et al., "Connected Components in MapReduce and
    Beyond"): each round every node hangs its larger neighbors
    (large-star) then its smaller neighbors (small-star) directly off
    the minimum of its neighborhood, which contracts components into
    min-centered stars in O(log²) rounds — on chain-shaped graphs far
    fewer rounds than per-hop min-label propagation, and the edge list
    SHRINKS toward one edge per non-min node as it converges (label
    propagation keeps the full edge list live every round).

    Distribution shape per round: two groupBy-min aggregations (map-side
    combine) + two equi-joins, all keyed on node id, shuffle ∝ current
    edges. Each round's edge list is ``localCheckpoint``-ed — a plain
    persist is NOT enough: unpersisting round k cascade-invalidates
    round k+1's cache, silently recomputing the whole history.
    Convergence is checked every ``check_every`` rounds with one small
    aggregate (edge count + order-independent hash/id sums — no
    edge-table self-join), stopping when the edge set is stable; the
    star fixpoint is idempotent under both steps. The default checks
    EVERY round: a signature scan is one map-side aggregate over the
    checkpointed edges (no extra shuffle) while a star round is ~5
    shuffles over the same data, so detecting the fixpoint one round
    earlier always wins — at any scale.
    """
    raw = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    if small_graph_cap > 0:
        # ONE bounded job decides the branch AND supplies the driver
        # rows: limit(cap+1) never ships more than cap+1 two-long rows
        # whatever the corpus size; cap+1 rows back means the graph is
        # over the cap — fall through to the loop (the probe cost is
        # one truncated scan of the 2-column edge projection).
        head = raw.limit(small_graph_cap + 1).collect()
        if len(head) <= small_graph_cap:
            return _connected_components_driver(raw.sparkSession, head)
    # Pin shuffle parallelism to the machine for the duration of the
    # loop (restored in the finally below). A vanilla session's default
    # 200 shuffle partitions get materialized by EVERY per-round
    # localCheckpoint (eager RDD materialization bypasses AQE's
    # partition coalescing), so on an 8-core driver session the loop
    # pays 200-task scheduling overhead per round: measured 23.5 s →
    # ~6 s at sf0.01 with the pin. A cluster deployment would instead
    # size shuffle.partitions to the cluster up front.
    spark = pairs.sparkSession
    prev_conf = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set(
        "spark.sql.shuffle.partitions", spark.sparkContext.defaultParallelism
    )
    try:
        return _connected_components_loop(raw, max_iterations, check_every)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_conf)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _connected_components_driver(spark: SparkSession, rows) -> DataFrame:
    """Driver-side closure for capped graphs: union-find with path
    compression and min-root union, so every node's label is the
    minimum reachable id — bit-identical to the distributed loop's
    fixpoint, INCLUDING null-endpoint semantics (ids that failed the
    long cast become NULL; the loop treats a node with a null partner
    as a singleton and emits one (NULL, NULL) row for the null
    endpoint itself — SQL min() ignores nulls and DISTINCT keeps one
    NULL). ``rows`` is the already-collected, cap-bounded edge list;
    output is parallelized back as a (node, cluster_id) frame."""
    parent: dict[int, int] = {}
    has_null = False

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row["a"], row["b"]
        if a is not None:
            parent.setdefault(a, a)
        if b is not None:
            parent.setdefault(b, b)
        if a is None or b is None:
            has_null = True
            continue
        ra, rb = find(a), find(b)
        if ra != rb:  # min root wins -> labels are component minima
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    out = [(n, find(n)) for n in parent]
    if has_null:
        out.append((None, None))
    return spark.createDataFrame(out, "node BIGINT, cluster_id BIGINT")


#: ~32 MB of (long, long) edge rows per shuffle task in the CC loop.
_CC_EDGE_ROWS_PER_TASK = 2_000_000

# Measured dead-end, recorded so nobody re-tries it: fusing 2 star
# rounds per checkpoint/signature sync was SLOWER at sf0.1 (best
# 14.8 s vs 10.0 s), both naively (the lazily-composed intermediate is
# referenced ~4× by the next round → recomputed, 18 s) and with a lazy
# persist of the intermediate (cache write/read + doubled plan compile
# outweigh the saved checkpoint job). One eager materialization per
# round is the cheapest sync this loop gets.


def _cc_loop_partitions(spark: SparkSession, n_edges: int) -> int:
    """Shuffle parallelism for one CC round, sized from the LIVE edge
    count. The loop runs under persist/localCheckpoint where AQE's
    runtime coalescing never applies, so a fixed setting pays full
    task-scheduling overhead every round even as the edge list
    contracts toward one edge per node — on a small graph that
    overhead IS the runtime (measured at sf0.1: 12 k edges through
    32-partition rounds = 9.5 s of scheduling for < 1 MB of data).
    The signature aggregate already collects the edge count each
    round, so sizing is free: ceil(edges / rows-per-task), capped at
    defaultParallelism (total cluster cores) — a 1B-edge round still
    uses every core; a 12 k-edge round runs 1-task stages.

    Staleness: the caller refreshes ``n_edges`` only at signature
    checks, so with ``check_every > 1`` a round can be sized from a
    count up to ``check_every`` rounds old. Edge lists only contract,
    so a stale count merely over-provisions partitions (never
    under-sizes a grown graph); the default ``check_every = 1`` makes
    the count exact every round."""
    import math

    cap = max(1, spark.sparkContext.defaultParallelism)
    return max(1, min(cap, math.ceil(n_edges / _CC_EDGE_ROWS_PER_TASK)))


def _connected_components_loop(
    raw: DataFrame, max_iterations: int, check_every: int
) -> DataFrame:
    spark = raw.sparkSession
    # localCheckpoint persists an INTERNAL RDD we hold no handle to; the
    # id-diff bookkeeping below (single-threaded driver — diffs are
    # race-free) lets each round release the PREVIOUS round's blocks as
    # soon as the new checkpoint is materialized, bounding loop storage
    # at ~2 rounds instead of the full round history. The surviving
    # nodes + final-edges checkpoints (which the returned DataFrame
    # still reads) are registered with caching.track_rdd_ids for
    # caching.release_cached() once the caller has materialized.
    entry_ids = caching.persistent_rdd_ids(spark)
    nodes = (
        raw.select(F.col("a").alias("node"))
        .unionAll(raw.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    # Signature metrics, order-independent AND overflow-free: bit_xor
    # over int64 never overflows, unlike F.sum(xxhash64(...)) which
    # throws ARITHMETIC_OVERFLOW under Spark 4's default ANSI mode on
    # any non-trivial edge list (xxhash64 values are uniform over the
    # full long range). count disambiguates xor collisions from
    # even-multiplicity edge swaps; the per-column xors guard the
    # (astronomically unlikely) pair-hash collision.
    #
    # r17 (guide §2.6 — cut per-round job count): the signature is no
    # longer its own post-checkpoint aggregate JOB; it rides the
    # checkpoint materialization as an ``observe`` (CollectMetrics)
    # node — one job per round instead of two, same four values over
    # the same rows (verified: Observation populates under eager
    # localCheckpoint).
    def _sig_metrics():
        return (
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("hx"),
            F.bit_xor("u").alias("xu"),
            F.bit_xor("v").alias("xv"),
        )

    def _sig_of(obs: Observation):
        got = obs.get
        return (got["n"], got["hx"], got["xu"], got["xv"])

    base_ids = caching.persistent_rdd_ids(spark)
    obs0 = Observation()
    edges = (
        _canonical_edges(raw, "a", "b")
        .observe(obs0, *_sig_metrics())
        .localCheckpoint()
    )
    prev_ids = caching.persistent_rdd_ids(spark) - base_ids

    def _star_round(e: DataFrame) -> DataFrame:
        """One lazy large-star + small-star pass (Kiveris et al.)."""
        # large-star: for each u, hang every LARGER neighbor v off
        # m = min({u} ∪ N(u))
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        # canonicalize WITHOUT distinct: the only consumers are the
        # min-aggregation below (duplicate-tolerant, partial-aggregated
        # map-side so dup edges never inflate the shuffle) and the
        # small-star join; the sync point's result still dedups. This
        # removes one full shuffle from every round.
        lsj = sym.join(mins, "u").filter(F.col("v") > F.col("u"))
        ls = lsj.filter(F.col("v") != F.col("m")).select(
            F.greatest(F.col("v"), F.col("m")).alias("u"),
            F.least(F.col("v"), F.col("m")).alias("v"),
        )
        # small-star: edges now directed u > v; for each u, hang every
        # smaller neighbor (and u itself) off m = min of the smaller set
        smins = ls.groupBy("u").agg(F.min("v").alias("m"))
        return _canonical_edges(
            ls.join(smins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionAll(smins.select(F.col("u").alias("a"), F.col("m").alias("b"))),
            "a",
            "b",
        )

    # Signature of the INPUT edges before any round: seeds the
    # convergence compare (both star steps are idempotent at the
    # fixpoint, so input == first-sync output means already converged)
    # and, more importantly, hands round 1 a live edge count so its
    # shuffles are sized like every later round's. Read off the
    # checkpoint's own observation — no separate job.
    prev_sig = _sig_of(obs0)
    n_edges = prev_sig[0]
    converged = False
    syncs = 0
    it = 0
    # ONE star round per materialization (sync point) — see the
    # measured fused-rounds dead-end note above _cc_loop_partitions.
    # Each round's cost at small live-edge counts is per-sync fixed
    # overhead (checkpoint job + stage scheduling), which the
    # observe-fused signature and the live-edge shuffle sizing below
    # minimize.
    while it < max_iterations:
        parts = _cc_loop_partitions(spark, n_edges)
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        # A 1-partition round cannot benefit from AQE (nothing to
        # coalesce or skew-split), but still pays its per-stage
        # replanning latency — which on a contracted edge list IS
        # the round's cost (measured: 7.0 s → 4.2 s over a 7-round
        # loop at sf0.1). Re-enabled by connected_components'
        # finally, and left on whenever the graph spans >1
        # partition, where skew-splitting star centers matters.
        spark.conf.set("spark.sql.adaptive.enabled", str(parts > 1).lower())
        obs = Observation()
        nxt = _star_round(edges).observe(obs, *_sig_metrics())
        pre_ids = caching.persistent_rdd_ids(spark)
        ss = nxt.localCheckpoint()
        new_ids = caching.persistent_rdd_ids(spark) - pre_ids
        # previous sync fed only the checkpoint just materialized —
        # release its blocks now (eager localCheckpoint: data is safe)
        caching.unpersist_rdd_ids(spark, prev_ids)
        prev_ids = new_ids
        edges = ss
        it += 1
        syncs += 1
        # the signature rides every checkpoint for free now; the live
        # edge count is therefore exact every round even when the
        # convergence COMPARE runs only at check_every sync points
        sig = _sig_of(obs)
        n_edges = sig[0]
        if syncs % check_every == 0 or it >= max_iterations:
            if sig == prev_sig:
                converged = True
                break
            prev_sig = sig
    if not converged:
        # The final extraction below assumes the star fixpoint (every
        # node points at its component min); an exhausted iteration
        # budget would silently yield wrong cluster ids otherwise.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; raise max_iterations (rounds needed grow "
            "O(log^2 diameter))"
        )
    # nodes + final edges checkpoints stay live for the returned plan;
    # releasable by the caller via caching.release_cached() after
    # materializing (stale rounds were already released in-loop)
    caching.track_rdd_ids(spark, caching.persistent_rdd_ids(spark) - entry_ids)
    # at the fixpoint every non-center node has exactly one (smaller)
    # neighbor: the component min; centers and isolated nodes label
    # themselves
    centers = edges.groupBy("u").agg(F.min("v").alias("label"))
    return nodes.join(centers, nodes.node == centers.u, "left").select(
        "node", F.coalesce(F.col("label"), F.col("node")).alias("cluster_id")
    )


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    small_graph_cap: int = 0,
    max_bucket_size: int | None = LSH_MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """End-to-end near-dup clustering: exact-dup collapse → MinHash →
    LSH pairs → connected components → (doc_id, cluster_id,
    is_representative). Docs with no near-dup partner form singleton
    clusters of themselves.

    The signature/LSH/components pipeline runs on exact-dedup
    representatives only (:func:`exact_collapse`); every member then
    inherits its representative's component. This is output-equivalent
    to clustering the full corpus — exact duplicates share signatures,
    so they always land in their representative's component, and the
    component minimum over all members equals the minimum over
    representatives (each group's minimum IS its representative) — but
    the iterative stage sees a graph smaller by the duplicate factor.
    """
    members = caching.persist_tracked(exact_collapse(docs, text_col, id_col))
    reps = _representatives(docs, members, id_col)
    scope = caching.mark()
    # persisted: connected_components materializes its input twice
    # (node list + canonical edge list) — without this the LSH
    # self-join + distinct runs twice
    pairs = caching.persist_tracked(
        minhash_lsh_pairs(reps, text_col, id_col, k=k, bands=bands,
                          max_bucket_size=max_bucket_size)
    )
    comps = connected_components(pairs, small_graph_cap=small_graph_cap)
    # the CC loop ran eagerly and checkpoint-truncated its output
    # lineage: the pair list and the LSH band table feeding it are dead
    # weight now — release them before returning (members stays: the
    # final join below still reads it lazily)
    caching.release_from(scope)
    return _expand_members(members, comps, id_col)


def _expand_members(
    members: DataFrame, comps: DataFrame, id_col: str
) -> DataFrame:
    """Expand component labels over representatives back to every
    member of the exact-dup membership map: (doc_id, cluster_id,
    is_representative). Shared by :func:`dedup_clusters` and its
    oracle-bearing twin :func:`blocked_dedup_clusters_full`, so the
    twin's hash gate covers this exact expansion code. ``comps`` is
    (node, cluster_id) over representatives; reps absent from it
    (isolated under a pair-list CC input) label themselves."""
    out = members.join(comps, members.rep_id == comps.node, "left")
    cluster = F.coalesce(F.col("cluster_id"), F.col("rep_id"))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (F.col(id_col) == cluster).alias("is_representative"),
    )


def blocked_dedup_clusters_full(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    small_graph_cap: int = 0,
) -> DataFrame:
    """Oracle-bearing twin of the FULL :func:`dedup_clusters` shape
    (VERDICT r12 #3): exact-dup collapse → representatives → connected
    components → member expansion with the keep flag, identical code
    path at every stage (:func:`exact_collapse`,
    :func:`_representatives`, :func:`_expand_members` are the same
    functions dedup_clusters calls) — except the candidate edges come
    from the SQL-expressible md5-prefix blocking graph instead of the
    Spark-specific MinHash/LSH family, so a DuckDB oracle replays the
    ENTIRE composition and hash-checks (doc_id, cluster_id,
    is_representative). This closes the last un-hash-gated residue of
    dedup_clusters: the blocked twin gated only the CC loop's labels;
    this one also gates the collapse → reps pre-stage and the
    expansion/keep-flag tail."""
    members = caching.persist_tracked(exact_collapse(docs, text_col, id_col))
    reps = _representatives(docs, members, id_col)
    comps = blocked_dedup_clusters(
        reps, text_col, id_col, small_graph_cap=small_graph_cap
    ).withColumnRenamed("doc_id", "node")
    return _expand_members(members, comps, id_col)


def blocking_prefix_len(n_docs: int, target_block: int = 16, floor: int = 3) -> int:
    """Hex-prefix length so the EXPECTED md5-block size stays near
    ``target_block`` docs: 16^len buckets over a uniform digest →
    len = ceil(log16(n / target)), floored at the historical 3.

    This is the knob VERDICT r3 flagged: at a fixed prefix the expected
    block grows linearly with the corpus (and the self-join
    quadratically per block); deriving it from the corpus count keeps
    per-block work constant at any scale. The DuckDB oracle computes
    the SAME expression in SQL (GREATEST/CEIL/LN over COUNT(*)), so
    Spark and oracle always agree on the graph.
    """
    import math

    n = max(int(n_docs), 1)
    if n <= target_block:
        return floor
    return max(floor, math.ceil(math.log(n / target_block) / math.log(16)))


def blocked_dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefixes: tuple[tuple[int, int], ...] | None = None,
    prepared: bool = False,
    small_graph_cap: int = 0,
) -> DataFrame:
    """Connected-components clustering over a DETERMINISTIC,
    SQL-expressible candidate graph → (doc_id, cluster_id).

    Companion to :func:`dedup_clusters` built so the iterative
    large-star/small-star operator itself can be hash-checked against a
    DuckDB recursive-CTE oracle: candidate edges come from md5-prefix
    blocking (docs sharing any configured substring of their
    md5(normalized text) fingerprint are connected) instead of the
    Spark-specific MinHash/LSH family. Two overlapping blocking
    functions make the union graph genuinely transitive — A~B under
    one prefix and B~C under the other chains A,B,C into one component
    — so the oracle must compute a real closure, not a GROUP BY.

    Scale shape: each blocking is a self-equi-join on a short prefix
    key (shuffle ∝ corpus); prefix length bounds expected block size
    (16^len buckets) and is AUTO-SIZED from the corpus count via
    :func:`blocking_prefix_len` when ``prefixes`` is None — two
    non-overlapping windows ``(1, L), (L+1, L)`` so the union graph
    needs a real transitive closure. The sizing count is one cheap
    column-pruned scan, paid once to keep every block O(target) at any
    corpus size. Exact duplicates share the full digest, hence every
    block, hence always cluster together — consistent with the
    reference's exact dedup semantics (etl.py:358-368).
    """
    # persisted: the hashed projection feeds the sizing count, both
    # sides of the blocking self-join, and the final label join — six
    # evaluations of the normalize-regex + md5 chain without it
    # (released by the caller via caching.release_cached()).
    # prepared=True: docs already carries __norm (shared pipeline
    # projection) — hash that instead of re-normalizing.
    content = F.col("__norm") if prepared else normalize_doc(F.col(text_col))
    d = caching.persist_tracked(
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.md5(content).alias("h"),
        )
    )
    if prefixes is None:
        length = blocking_prefix_len(d.count())
        prefixes = ((1, length), (length + 1, length))
    # Each block is a CLIQUE (every member shares the key), so its
    # star — member → block-minimum — has the identical transitive
    # closure with O(block) edges instead of O(block²). One shuffle
    # builds all stars: explode each doc to its (prefix_id,
    # prefix_key) pairs, aggregate per key to (min, member list),
    # re-explode. collect_list is safe here precisely because the
    # auto-sized prefix bounds the expected block at ~target_block
    # docs regardless of corpus size. Edge volume drops by the block
    # size (~16×) and the CC loop starts on a near-fixpoint star
    # forest. The oracle is unaffected: it closes over its own clique
    # edges, and identical connectivity ⇒ identical component minima.
    pk = F.array(
        *[
            F.struct(
                F.lit(i).alias("pid"),
                F.substring(F.col("h"), start, length).alias("k"),
            )
            for i, (start, length) in enumerate(prefixes)
        ]
    )
    keyed = d.select("doc_id", F.explode(pk).alias("pk")).select(
        "doc_id", "pk.pid", "pk.k"
    )
    blocks = keyed.groupBy("pid", "k").agg(
        F.min("doc_id").alias("m"), F.collect_list("doc_id").alias("members")
    )
    edges = blocks.select(
        F.explode("members").alias("u"), F.col("m").alias("v")
    ).filter(F.col("u") != F.col("v"))
    comps = connected_components(edges, "u", "v", small_graph_cap=small_graph_cap)
    return d.join(comps, d.doc_id == comps.node, "left").select(
        d.doc_id, F.coalesce(F.col("cluster_id"), d.doc_id).alias("cluster_id")
    )


def word_tokens(col) -> F.Column:
    """Whitespace word tokens of the normalized text (non-empty)."""
    return F.filter(F.split(normalize_doc(col), r"\s+"), lambda t: t != "")


def let_once(bound: F.Column, body) -> F.Column:
    """Evaluate ``bound`` ONCE per row and feed the value to ``body``
    (a let-binding): the value rides a 1-element array through a
    ``transform`` whose lambda variable is a true runtime binding.

    Why (r16): a multiply-referenced alias materialized in its own
    Project is not always a barrier — the optimizer can collapse the
    Projects and re-inline the aliased expression at EVERY reference,
    including references inside lambda bodies, where an expression
    like ``element_at(<tokenizer chain>, i)`` then re-runs the whole
    regex/split chain PER ARRAY ELEMENT (measured: the containment
    shingle stage spent ~46 s of its 48 s cold time re-tokenizing per
    gram element at sf0.1). The lambda binding is opaque to that
    rewrite. Zero shuffle — the in-expression alternative to
    ``_with_normalized``'s repartition barrier.
    """
    return F.get(F.transform(F.array(bound), body), 0)


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document → (id, simhash).

    Token multiset hashed with xxhash64; bit i of the signature is the
    sign of sum over tokens of (+1 if bit i of hash else -1). The 64
    per-bit sums are 64 JVM-side aggregate expressions over the
    exploded tokens — one shuffle keyed by doc id, partial aggregation
    map-side.
    """
    norm = _with_normalized(docs, text_col, id_col)
    tokens = F.filter(F.split(F.col("__norm"), r"\s+"), lambda t: t != "")
    toks = norm.select(F.col(id_col), F.explode(tokens).alias("tok"))
    h = F.xxhash64(F.col("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b_{i}")
        for i in range(64)
    ]
    per_bit = toks.groupBy(id_col).agg(*aggs)
    sig = functools.reduce(
        lambda acc, i: acc.bitwiseOR(
            F.shiftleft(F.when(F.col(f"b_{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i)
        ),
        range(1, 64),
        F.when(F.col("b_0") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    return per_bit.select(F.col(id_col), sig.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: split the 64-bit signature into ``chunks``
    16-bit chunks; any pair within ``chunks - 1`` differing bits shares
    at least one identical chunk, so the candidate join is an equi-join
    on (chunk_id, chunk_value) — shuffle ∝ corpus, and the exact
    hamming check (``bit_count(xor)``) runs only on bucket collisions.
    Requires max_hamming < chunks for completeness.
    """
    sigs = simhash64(docs, text_col, id_col)
    width = 64 // chunks
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright(F.col("simhash"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("chunk_value"),
            )
            for c in range(chunks)
        ]
    )
    # persisted for the same reason as the LSH band table: the self-
    # join would otherwise recompute the token→signature pipeline twice
    chunked = caching.persist_tracked(
        sigs.select(F.col(id_col), F.col("simhash"), F.explode(chunk_structs).alias("cc"))
        .select(id_col, "simhash", "cc.chunk_id", "cc.chunk_value")
    )
    left, right = chunked.alias("l"), chunked.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.chunk_id") == F.col("r.chunk_id"),
                F.col("l.chunk_value") == F.col("r.chunk_value"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sig_a"),
            F.col("r.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", hamming).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def ngram_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    threshold: float = 0.0,
) -> DataFrame:
    """Verify candidate (id_a, id_b) pairs with exact n-gram Jaccard.

    Per-doc shingle sets are joined onto the pair table (two equi-joins
    keyed by doc id) and the Jaccard is an array intersection/union on
    the pair row — compute ∝ |pairs|, never corpus².

    Shingles are xxhash64-hashed to longs BEFORE the join: the set
    payload shuffled per pair drops ~5× (8-byte longs vs ~5-char
    strings) and the per-pair intersection compares fixed-width values.
    Jaccard over hashed shingles equals Jaccard over the strings up to
    64-bit collisions — vanishing at any real shingle-set size.

    Shingling is restricted (left-semi) to docs that actually appear in
    the candidate pairs: under an upstream prefilter the surviving-pair
    doc set can be far smaller than the corpus, and docs outside it
    should never pay the shingle transform or occupy cache.
    """
    pair_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionAll(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    docs = docs.join(pair_ids, id_col, "left_semi")
    grams = caching.persist_tracked(
        _with_normalized(docs, text_col, id_col).select(
            F.col(id_col).alias("gid"),
            F.transform(char_shingles(F.col("__norm"), shingle_n), lambda s: F.xxhash64(s)).alias(
                "grams"
            ),
        )
    )
    out = (
        pairs.join(grams.withColumnRenamed("gid", "id_a").withColumnRenamed("grams", "g_a"), "id_a")
        .join(grams.withColumnRenamed("gid", "id_b").withColumnRenamed("grams", "g_b"), "id_b")
        # |A ∪ B| = |A| + |B| − |A ∩ B|: the arrays are distinct sets
        # (char_shingles applies array_distinct), so the inclusion-
        # exclusion identity is exact and saves array_union's second
        # per-pair hash-set build — intersect is the only O(|A|+|B|)
        # pass per pair.
        .withColumn("inter", F.size(F.array_intersect("g_a", "g_b")))
        .withColumn("uni", F.size("g_a") + F.size("g_b") - F.col("inter"))
        .withColumn(
            "jaccard",
            round_half_up(F.col("inter") / F.when(F.col("uni") > 0, F.col("uni")), 4),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def blocked_jaccard_pairs(
    docs: DataFrame,
    shingle_n: int = 5,
    target_block: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact character-n-gram Jaccard for a DETERMINISTIC pair sample:
    docs sharing an auto-sized md5(doc_id) hex prefix pair up, and each
    pair gets its exact shingle-set Jaccard — no LSH, no xxhash64, so a
    SQL oracle can rebuild every shingle set and score string for
    string. This is the value gate for the Jaccard MATH that
    :func:`ngram_jaccard_verified` applies to its (Spark-specific) LSH
    candidates; the id-hash blocks are a similarity-blind SAMPLE, which
    is exactly what a math gate wants (scores span the full range).

    Scale shape: the prefix auto-sizes from the corpus count
    (:func:`blocking_prefix_len`, floor 2 — expected block ~
    ``target_block`` docs), so candidate pairs grow ∝ corpus ·
    target_block/2, never quadratically; the join shuffles on the
    block key and per-pair work is one O(|A|+|B|) intersect.
    Contentless (NULL-normalized) docs are excluded — their pairing
    semantics belong to the exact-dup stage (:func:`exact_collapse`).
    """
    n_docs = docs.count()  # scalar for the prefix length, not a data collect
    plen = blocking_prefix_len(n_docs, target_block, floor=2)
    d = (
        _with_normalized(docs, text_col, id_col)
        .filter(F.col("__norm").isNotNull())
        .select(
            F.col(id_col),
            F.substring(F.md5(F.col(id_col).cast("string")), 1, plen).alias("__blk"),
            char_shingles(F.col("__norm"), shingle_n).alias("__g"),
        )
    )
    a = d.select(
        F.col(id_col).alias("id_a"), F.col("__blk"), F.col("__g").alias("g_a")
    )
    b = d.select(
        F.col(id_col).alias("id_b"), F.col("__blk"), F.col("__g").alias("g_b")
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("inter", F.size(F.array_intersect("g_a", "g_b")))
        .withColumn("uni", F.size("g_a") + F.size("g_b") - F.col("inter"))
        .select(
            "id_a",
            "id_b",
            round_half_up(
                F.col("inter") / F.when(F.col("uni") > 0, F.col("uni")), 4
            ).alias("jaccard"),
        )
    )


def exact_dup_by_source(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source exact-duplication curation report.

    The corpus-health rollup every curation pass starts from: for each
    source, how many documents are redundant copies (same
    md5(normalized text) group, not the min-id keeper) and how many
    distinct duplicated contents exist. NULL-normalized (contentless)
    docs share the ``'__null__'`` sentinel group — the same semantics
    as :func:`exact_collapse`, so the report's dup counts agree with
    what the collapse stage would actually drop.

    Scale shape: two keyed shuffles — groupBy(content hash) for group
    size/keeper, then groupBy(source) for the rollup; the hash join in
    between reuses the hash partitioning. No windows, no driver trips.

    Output: (source, n_docs, n_dup_docs, dup_rate 4dp, n_dup_groups).
    """
    hashed = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col),
        F.coalesce(F.md5(normalize_doc(F.col(text_col))), F.lit("__null__")).alias(
            "__ch"
        ),
    )
    groups = hashed.groupBy("__ch").agg(
        F.count(F.lit(1)).alias("__sz"), F.min(id_col).alias("__keeper")
    )
    dup = F.when(F.col(id_col) != F.col("__keeper"), 1).otherwise(0)
    return (
        hashed.join(groups, "__ch")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(dup).cast("long").alias("n_dup_docs"),
            round_half_up(F.sum(dup) / F.count(F.lit(1)), 4).alias("dup_rate"),
            F.countDistinct(F.when(F.col("__sz") > 1, F.col("__ch")))
            .cast("long")
            .alias("n_dup_groups"),
        )
    )


def span_dup_report(
    docs: DataFrame,
    span: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document repeated-span report — dedup at sub-document
    granularity (the Lee et al. 2021 "Deduplicating Training Data"
    shape, at token-window rather than suffix-array resolution).

    Each document is cut into consecutive NON-overlapping ``span``-token
    windows (ragged tail dropped — a partial window is not a comparable
    unit); a window whose exact text occurs in ≥2 distinct documents is
    "shared". Per document: how many spans it has and what fraction of
    them also appear elsewhere — the signal a span-level scrubber would
    act on. Production corpora use spans of ~50 tokens; the parameter
    only changes the slice width, not the plan.

    Scale shape: span construction is map-only (``sequence`` +
    ``slice`` + ``explode`` in one projection — the chunker's plan with
    stride == size); spans are hashed to 64-bit before the shuffle so
    the groupBy(span) carries 8-byte keys, not span text. The span
    table feeds BOTH sides of the shared-count join, so it is persisted
    (caching.persist_tracked — a self-join recomputes its input twice
    otherwise; caller releases via release_cached). Two keyed shuffles
    total: groupBy(span hash) for the distinct-doc count, then
    groupBy(doc) for the rollup (the join between them reuses the span
    partitioning). No windows, no driver trips, output rows == docs.

    Output: (doc_id, n_spans, n_shared_spans, shared_rate 4dp).
    """
    toks = word_tokens(F.col(text_col))
    n_spans = F.floor(F.size("__toks") / span).cast("int")
    piece = lambda i: F.xxhash64(  # noqa: E731 — slice is 1-based
        F.array_join(F.slice(F.col("__toks"), i * span + 1, span), " ")
    )
    spans = caching.persist_tracked(
        docs.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= span)
        .select(
            id_col,
            F.explode(
                F.transform(F.sequence(F.lit(0), n_spans - 1), piece)
            ).alias("__sh"),
        )
    )
    # distinct docs per span content; >=2 distinct docs == shared span
    shared = spans.groupBy("__sh").agg(
        F.countDistinct(id_col).alias("__ndocs")
    )
    is_shared = F.when(F.col("__ndocs") >= 2, 1).otherwise(0)
    return (
        spans.join(shared, "__sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(is_shared).cast("long").alias("n_shared_spans"),
            round_half_up(F.sum(is_shared) / F.count(F.lit(1)), 4).alias(
                "shared_rate"
            ),
        )
    )


def cdc_chunk_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_hex: "tuple[str, ...]" = ("0", "1", "2", "3"),
    min_words: int = 1,
) -> DataFrame:
    """Content-defined-chunking (CDC) cross-document dedup report —
    the shift-robust complement of :func:`span_dup_report`.

    Fixed-stride spans lose alignment under insertion: one extra word
    at a document's head shifts EVERY downstream window, so two docs
    sharing a long run stop sharing spans. CDC (the rsync/LBFS cut
    rule, the shape production dataset-dedup uses for sub-document
    granularity) places a chunk boundary AFTER every word whose
    ``md5`` starts with one of ``boundary_hex`` (P = len/16 per word;
    default 1/4 → mean 4-word chunks): boundaries are a function of
    LOCAL content only, so an edit perturbs at most the chunk it
    lands in and its immediate neighbor — all other chunk identities
    survive, and shared runs between documents keep colliding
    (property-pinned in tests/test_round12_ops.py).

    Scale shape: posexplode(words) is map-only; the running boundary
    count is ONE window PARTITIONED BY doc (frames bounded by document
    length — never a global window); chunk texts re-assemble with an
    order-pinned collect_list (array_sort over (pos, word) structs —
    deterministic under any shuffle), hash to 8-byte xxhash64 keys
    before the two keyed shuffles (chunk-grain distinct-doc count,
    doc-grain rollup), exactly the span report's join shape. The chunk
    table feeds both sides of the shared-count join → persisted.

    Output: (doc_id, n_chunks, n_shared_chunks, shared_rate 4dp).
    """
    from pyspark.sql.window import Window as W

    toks = word_tokens(F.col(text_col))
    words = (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= min_words)
        .select(id_col, F.posexplode("__toks").alias("__pos", "__w"))
    )
    is_boundary = (
        F.when(
            F.substring(F.md5(F.col("__w")), 1, 1).isin(*boundary_hex), 1
        ).otherwise(0)
    )
    run = (
        W.partitionBy(id_col)
        .orderBy("__pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = words.select(id_col, "__pos", "__w", is_boundary.alias("__b"))
    chunked = flagged.select(
        id_col,
        "__pos",
        "__w",
        (F.sum("__b").over(run) - F.col("__b")).alias("__cid"),
    )
    chunks = caching.persist_tracked(
        chunked.groupBy(id_col, "__cid").agg(
            F.xxhash64(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("__pos", "__w"))),
                        lambda s: s["__w"],
                    ),
                    " ",
                )
            ).alias("__ch")
        )
    )
    shared = chunks.groupBy("__ch").agg(
        F.countDistinct(id_col).alias("__ndocs")
    )
    is_shared = F.when(F.col("__ndocs") >= 2, 1).otherwise(0)
    return (
        chunks.join(shared, "__ch")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(is_shared).cast("long").alias("n_shared_chunks"),
            round_half_up(F.sum(is_shared) / F.count(F.lit(1)), 4).alias(
                "shared_rate"
            ),
        )
    )


def repeated_substring_runs(
    docs: DataFrame,
    k: int = 3,
    min_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Variable-length exact repeated-substring detection — the
    suffix-array-grade extension of :func:`span_dup_report`
    (Lee et al. 2021 §4: scrub any substring of ≥ ~50 tokens that
    repeats in the corpus; VERDICT r14 #10). Fixed non-overlapping
    windows miss a long shared run that straddles window boundaries
    and cannot report the run's true extent; this operator recovers
    MAXIMAL duplicated token ranges via seed-and-extend:

    1. every STRIDE-1 ``k``-token shingle (position ``p``, 0-based)
       is hashed; a shingle whose text occurs in ≥ 2 distinct
       documents marks position ``p`` as a duplicated SEED — exactly
       the suffix-array "repeated prefix of length ≥ k" predicate;
    2. maximal runs of CONSECUTIVE seed positions merge by
       gaps-and-islands (``p − row_number()`` per document — the same
       island trick the sessionizer uses); a run of ``m`` consecutive
       seeds is an exactly-repeated substring of ``m + k − 1`` tokens
       (every k-window inside it repeats elsewhere);
    3. runs shorter than ``min_len`` tokens drop (production ≈ 50;
       the default suits the synthetic vocabulary).

    Sharing is CROSS-document (distinct-doc count ≥ 2), matching the
    span/CDC family; a run repeated only within one document does not
    flag. Invariant (ADVICE r15): every ``k``-token WINDOW of a
    reported run repeats verbatim in some other document — but
    consecutive windows may match DIFFERENT partner documents or
    positions, so the full run as one string is not guaranteed to
    appear verbatim elsewhere (A='a b c d e' with B⊇'a b c d' and
    C⊇'c d e' reports one 5-token run found in neither B nor C as a
    whole). Run extents are therefore an UPPER bound on exact
    full-run repetition; callers scrubbing per Lee et al. §4 who need
    exact full-run matches must re-verify runs against their partner
    documents (split at partner discontinuities).

    Scale shape: the shingle table is one map-only
    sequence/transform/posexplode projection (corpus-token grain,
    8-byte hashes); ONE keyed shuffle counts distinct docs per
    shingle; the hit join reuses that partitioning; the island window
    partitions by the high-cardinality doc id (never global). No
    driver trips; output rows = qualifying runs.

    Output: (doc_id, start_pos, run_len) — one row per maximal
    duplicated run, positions 0-based in the normalized token stream.
    """
    from pyspark.sql.window import Window as W

    toks = word_tokens(F.col(text_col))
    nsh = F.size("__toks") - F.lit(k - 1)
    piece = lambda i: F.xxhash64(  # noqa: E731 — slice is 1-based
        F.array_join(F.slice(F.col("__toks"), i + 1, k), " ")
    )
    sh = caching.persist_tracked(
        docs.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= k)
        .select(
            id_col,
            F.posexplode(
                F.transform(F.sequence(F.lit(0), nsh - 1), piece)
            ).alias("__p", "__sh"),
        )
    )
    shared = (
        sh.groupBy("__sh")
        .agg(F.countDistinct(id_col).alias("__ndocs"))
        .filter(F.col("__ndocs") >= 2)
        .select("__sh")
    )
    hits = sh.join(shared, "__sh").select(id_col, "__p")
    w = W.partitionBy(id_col).orderBy("__p")
    islands = hits.select(
        id_col, "__p", (F.col("__p") - F.row_number().over(w)).alias("__g")
    )
    return (
        islands.groupBy(id_col, "__g")
        .agg(
            F.min("__p").cast("int").alias("start_pos"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("int").alias("run_len"),
        )
        .filter(F.col("run_len") >= min_len)
        .select(id_col, "start_pos", "run_len")
    )


def editdist_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 32,
    max_block: int = 64,
    min_sim: float = 0.8,
) -> DataFrame:
    """Prefix-blocked, edit-distance-VERIFIED near-duplicate pairs —
    the character-level complement of the token-set verifiers
    (:func:`ngram_jaccard_pairs` measures bag-of-shingles overlap;
    Levenshtein measures ORDERED character agreement, catching
    small in-place edits that reshuffle few shingles and, conversely,
    refusing shingle-identical permutations).

    Candidate generation is prefix blocking: documents sharing their
    first ``prefix_len`` normalized characters form a block, and only
    within-block pairs are scored — near-identical docs (boilerplate
    variants, re-crawls with appended footers) overwhelmingly share
    their head. Recall-limited BY DESIGN (a doc edited within the
    first ``prefix_len`` chars escapes the block); the LSH keys are
    the recall-oriented path, this one is the precision verifier.

    Scale shape: one groupBy sizes the blocks and the self-join runs
    only on blocks with 2..``max_block`` members — the cap is the
    hot-block guard (a viral boilerplate prefix would otherwise
    expand C(n,2) pairs; those blocks are exactly the ones exact/LSH
    dedup already collapses, so skipping them loses nothing). The
    verify is the JVM-native ``levenshtein`` on the pair row —
    compute ∝ Σ C(block,2) ≤ |docs|·max_block/2, never corpus².
    Similarity = 1 − dist/max(len) compared AFTER exact integer
    division (both operands integers → IEEE-identical across
    engines), so the cut is engine-stable.

    Output: (doc_a, doc_b, edit_dist, sim 4dp), doc_a < doc_b.
    """
    d = (
        _with_normalized(docs, text_col, id_col)
        .filter(F.col("__norm").isNotNull() & (F.length("__norm") > 0))
        .select(
            F.col(id_col),
            F.col("__norm"),
            F.substring("__norm", 1, prefix_len).alias("__blk"),
        )
    )
    sizes = d.groupBy("__blk").agg(F.count(F.lit(1)).alias("__bn"))
    blocked = d.join(
        sizes.filter(
            (F.col("__bn") >= 2) & (F.col("__bn") <= max_block)
        ).select("__blk"),
        "__blk",
    )
    a = blocked.select(
        F.col("__blk"),
        F.col(id_col).alias("doc_a"),
        F.col("__norm").alias("__sa"),
    )
    b = blocked.select(
        F.col("__blk"),
        F.col(id_col).alias("doc_b"),
        F.col("__norm").alias("__sb"),
    )
    pairs = a.join(b, "__blk").filter(F.col("doc_a") < F.col("doc_b"))
    dist = F.levenshtein(F.col("__sa"), F.col("__sb"))
    ml = F.greatest(F.length("__sa"), F.length("__sb"))
    sim = 1.0 - dist.cast("double") / ml.cast("double")
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            dist.cast("long").alias("edit_dist"),
            sim.alias("__sim"),
        )
        .filter(F.col("__sim") >= min_sim)
        .select(
            "doc_a",
            "doc_b",
            "edit_dist",
            round_half_up(F.col("__sim"), 4).alias("sim"),
        )
    )


def simhash32_portable(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Engine-portable 32-bit SimHash per document → (id, simhash) —
    the oracle-bearing twin of :func:`simhash64`, built the same way
    the CMS sketch got its value gate (sketches._cms_bucket): swap the
    Spark-only token hash (xxhash64) for the md5 8-hex prefix both
    engines evaluate identically, so a DuckDB oracle can rebuild the
    SAME signatures bit for bit and the whole signature construction
    (tokenize → per-bit majority vote → bit reassembly) is
    value-verified — evidence :func:`simhash64` (identical structure,
    different hash) inherits up to the hash function.

    32 bits rather than 64: the md5 prefix parses to a 32-bit value,
    and 32 per-bit JVM aggregate expressions keep the oracle's
    token × bit spine (the SQL mirror of the 32 aggregates) tractable.
    Production dedup stays on :func:`simhash64` — twice the bits at a
    cheaper per-token hash.

    Same one-shuffle shape as simhash64: per-bit sums are 32 JVM-side
    aggregates over the exploded tokens, combining map-side.
    """
    norm = _with_normalized(docs, text_col, id_col)
    tokens = F.filter(F.split(F.col("__norm"), r"\s+"), lambda t: t != "")
    toks = norm.select(F.col(id_col), F.explode(tokens).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    aggs = [
        F.sum(
            F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"b_{i}")
        for i in range(32)
    ]
    per_bit = toks.groupBy(id_col).agg(*aggs)
    sig = functools.reduce(
        lambda acc, i: acc
        + F.shiftleft(
            F.when(F.col(f"b_{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
            i,
        ),
        range(1, 32),
        F.when(F.col("b_0") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    return per_bit.select(F.col(id_col), sig.alias("simhash"))


def minhash_portable(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    shingle_n: int = 5,
) -> DataFrame:
    """Engine-portable MinHash signatures in LONG form
    (id, perm, minhash) — the oracle-bearing twin of
    :func:`minhash_signatures`, same pattern as
    :func:`simhash32_portable`: the permutation family is
    ``md5(perm:shingle)`` 8-hex prefixes, an expression DuckDB
    evaluates identically, so the oracle rebuilds every signature
    cell and the construction (shingle → per-permutation min) is
    value-verified end to end. Production LSH stays on
    :func:`minhash_signatures` (xxhash64 ± seed multipliers — one
    hash per shingle instead of k).

    Long form deliberately: k wide columns hash-compare fine, but the
    (id, perm) grain is what downstream band-grouping consumes and
    what a flat canonical sort handles without schema games.

    Scale shape: shingling is the shared in-plan kernel
    (:func:`char_shingles` — distinct grams stay with the row), the
    perm spine is a k-literal posexplode BEFORE the one combining
    shuffle to the (doc, perm) grain — shuffle rows ∝ docs·k after
    map-side partial mins, not shingles·k.
    """
    norm = _with_normalized(docs, text_col, id_col)
    sh = norm.select(
        F.col(id_col),
        F.explode(char_shingles(F.col("__norm"), shingle_n)).alias("g"),
    )
    perms = F.posexplode(F.array(*[F.lit(i) for i in range(k)]))
    e = sh.select(F.col(id_col), "g", perms.alias("perm", "__x"))
    hv = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("perm").cast("string"), F.col("g"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        e.select(F.col(id_col), F.col("perm").cast("int").alias("perm"), hv.alias("__h"))
        .groupBy(id_col, "perm")
        .agg(F.min("__h").alias("minhash"))
    )


def shingle_containment(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shingles: int = 8,
    min_containment: float = 0.5,
    max_df: int = 1000,
    top: int = 100,
) -> DataFrame:
    """ASYMMETRIC near-dup search: shingle-set containment
    ``C(A→B) = |S_A ∩ S_B| / |S_A|`` — the quote/inclusion detector
    (Broder's resemblance-vs-containment distinction). A short doc
    embedded verbatim in a long one has LOW Jaccard (the union is
    dominated by B) but containment ≈ 1; the symmetric near-dup family
    (MinHash/SimHash/ngram_jaccard) structurally misses exactly these
    pairs, which is why containment is its own operator.

    Shingles are WORD ``n``-grams, not character n-grams — a measured
    scale decision, not a style one: char 5-grams are near-universal
    across documents (median df 31 at a 500-doc corpus, Σdf² = 15.6 M
    join rows), so at corpus scale virtually every shingle saturates
    the df cap and the index self-join goes quadratic (the sf10
    budget breach that motivated this form); word 3-grams over the
    same corpus have median df 1 and Σdf² = 54 K — 290× less join
    volume, and the df law stays bounded by dup-cluster size rather
    than by alphabet statistics. Word n-grams are also the standard
    containment unit for quote detection (verbatim word sequences).

    Scale shape: inverted-index self-join on a DOUBLE xxhash64 of the
    shingle (16-byte shuffle keys instead of the shingle string — r16;
    equivalent unless two distinct shingles collide on both 64-bit
    hashes, ~2⁻¹²⁸ per pair, while the DuckDB oracle keeps grouping
    raw text), one intersection count per unordered pair,
    BOTH directed containments emitted from that single pass. Shingles
    with document frequency > ``max_df`` are pruned before the join —
    the LSH-bucket-cap role; with boilerplate shingles dropped the
    reported containment is a LOWER bound (denominator stays the full
    shingle count), which only ever suppresses, never invents, a pair.
    Docs with < ``min_shingles`` shingles are excluded as the contained
    side (containment over a tiny set is noise).

    Output (≤ top rows): doc_a (contained), doc_b (container),
    n_shingles_a, n_common, containment (4dp), ordered by
    (containment desc, doc_a, doc_b).
    """
    from . import caching

    def _grams_of(toks: F.Column) -> F.Column:
        return (
            F.when(
                F.size(toks) >= n,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                        lambda i: F.concat_ws(
                            " ",
                            *[F.element_at(toks, i + j) for j in range(n)],
                        ),
                    )
                ),
            )
            .otherwise(F.array().cast("array<string>"))
        )

    # let_once: the tokenizer chain must bind ONCE per row — without
    # the binding the optimizer inlined it into the gram lambda and
    # re-tokenized per element (~46 of the 48 s cold at sf0.1 — r16)
    grams = docs.select(
        F.col(id_col).alias("doc"),
        let_once(word_tokens(F.col(text_col)), _grams_of).alias("g"),
    )
    # r16 (guide §2.3 — shuffle keys, not payloads): the inverted
    # index only ever uses the shingle as an IDENTITY (df count, cap
    # filter, intersection join), so after the per-doc array_distinct
    # (exact, on strings) the shingle text is replaced by TWO
    # independent xxhash64 keys — 16 bytes crossing the three shuffles
    # instead of a ~25-byte word-3-gram string, and long-key hash/
    # compare instead of string. Equivalence: identical output unless
    # two DISTINCT shingles collide on BOTH 64-bit hashes
    # (~2⁻¹²⁸ per pair — the doubled-hash discipline VERDICT r15
    # suggested for the shingle-key family; the DuckDB oracle keeps
    # grouping raw shingle text).
    sh = caching.persist_tracked(
        grams.select("doc", F.explode("g").alias("gs")).select(
            "doc",
            F.xxhash64("gs").alias("g1"),
            F.xxhash64(F.lit(1), F.col("gs")).alias("g2"),
        )
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    # r16 rework of the intersection: instead of df-counting shingles,
    # joining the cap filter back, and SELF-JOINING the inverted index
    # (3 exchanges of the index + a size-estimate-driven join pick that
    # flipped to a 3.5M-row broadcast once the keys narrowed), group
    # each shingle's doc list ONCE and expand its C(n,2) pairs in-plan
    # with the shared array_pairs kernel (part_copurchase's). The df
    # cap bounds the expansion at C(max_df, 2) per shingle — the same
    # rows the capped self-join produced, shingle by shingle, so
    # n_common per pair is identical.
    from .analytics import array_pairs

    # ADVICE r16 (OOM risk at the large-corpus legs): pre-prune
    # OVERSIZED shingles with a CONSTANT-MEMORY count aggregate before
    # the collect_list — a boilerplate shingle present in ~all
    # documents must never materialize its full doc-id array in one
    # unspillable aggregation buffer. Each doc contributes a shingle
    # at most once (per-doc array_distinct upstream), so count(*) per
    # (g1, g2) equals the old size(ds) exactly and the kept docsets
    # are identical. The prune is an ANTI join against only the
    # buckets over the cap — a set bounded by index_rows/max_df and in
    # practice near-empty (boilerplate shingles), so at bench SFs it
    # broadcasts and the probe is map-side: the grouped collect keeps
    # its single full exchange, and the added cost is one partial-
    # aggregated count pass over the persisted 16-byte keys. (A
    # semi-join against ALL in-band buckets was measured first:
    # 0.73× at sf0.1 — the full-width exchange it forces on the index
    # costs more than the singleton rows it prunes.)
    oversized = (
        sh.groupBy("g1", "g2")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("g1", "g2")
    )
    docsets = (
        sh.join(oversized, ["g1", "g2"], "left_anti")
        .groupBy("g1", "g2")
        .agg(F.array_sort(F.collect_list("doc")).alias("ds"))
        .filter(F.size("ds") >= 2)
        .select("ds")
    )
    inter = (
        array_pairs(docsets, "ds", "ia", "ib")
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    both = inter.join(
        sizes.select(F.col("doc").alias("ia"), F.col("n_sh").alias("sa")),
        "ia",
    ).join(
        sizes.select(F.col("doc").alias("ib"), F.col("n_sh").alias("sb")),
        "ib",
    )
    # both directed rows from ONE pass over the pair table (the old
    # unionByName of two selects re-ran the whole intersection subtree
    # per branch); the final (containment, doc_a, doc_b) sort is total,
    # so row order changes cannot move the LIMIT cut
    directed = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ia").alias("doc_a"),
                    F.col("ib").alias("doc_b"),
                    F.col("sa").alias("n_shingles_a"),
                    F.col("n_common").alias("n_common"),
                ),
                F.struct(
                    F.col("ib").alias("doc_a"),
                    F.col("ia").alias("doc_b"),
                    F.col("sb").alias("n_shingles_a"),
                    F.col("n_common").alias("n_common"),
                ),
            )
        ).alias("__d")
    ).select("__d.doc_a", "__d.doc_b", "__d.n_shingles_a", "__d.n_common")
    from ..functions.rounding import round_half_up

    return (
        directed.filter(F.col("n_shingles_a") >= min_shingles)
        .withColumn(
            "containment",
            round_half_up(
                F.col("n_common").cast("double") / F.col("n_shingles_a"), 4
            ),
        )
        .filter(F.col("containment") >= F.lit(min_containment))
        .orderBy(
            F.col("containment").desc(),
            F.col("doc_a").asc(),
            F.col("doc_b").asc(),
        )
        .limit(top)
    )
