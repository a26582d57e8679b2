"""Mergeable sketches: count-min frequency + portable HyperLogLog.

Completes the mergeable-sketch family next to HLL++ cardinality
(events_approx_users) and the t-digest/quantile bands
(price_bands_sketch): CMS answers "how often does key k occur" in
``depth × width`` counters regardless of key cardinality — the
constant-memory heavy-hitter primitive (Cormode & Muthukrishnan 2005)
that at 100 TB replaces a full groupBy over an unbounded key space
with a fixed 4×1024-cell table.

Spark-first shape: the sketch IS a groupBy — each event lands in
``depth`` (row, bucket) cells via seeded md5-prefix buckets, and
groupBy(row, bucket).count() builds all counters in one map-side-
combining shuffle whose output is exactly ``depth × width`` rows.
Merging shards/streams is counter addition, which that same groupBy
already performs. Estimation for a candidate key takes the MIN over
its ``depth`` cells (each cell only ever over-counts — collisions add,
never subtract — so the min is the tightest upper bound; est >= truth
always, and est - truth <= e·N/width with prob 1-(1/e)^depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_bucket(key, row, width: int, engine_portable: bool = False):
    """CMS bucket for one hash row.

    Default (production / 100 TB path): ``xxhash64(key, row)`` mod
    width — one JVM-native 64-bit hash per cell, the cheapest seeded
    family Spark ships. ``engine_portable=True`` switches to the first
    8 hex chars of ``md5(key:row)`` parsed as an integer mod width —
    ~2.7× slower per event (measured r8→r9 at sf0.1) but an expression
    DuckDB evaluates identically, which is what lets the registry key
    carry a value-level oracle. The two modes are bucket-incompatible;
    pick one per sketch and merge only like with like."""
    if engine_portable:
        h = F.substring(
            F.md5(
                F.concat_ws(":", key.cast("string"), row.cast("string"))
            ),
            1,
            8,
        )
        return F.pmod(F.conv(h, 16, 10).cast("long"), F.lit(width))
    return F.pmod(F.xxhash64(key.cast("string"), row), F.lit(width))


def cms_cells(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    engine_portable: bool = False,
) -> DataFrame:
    """Build the CMS counter table: (row, bucket, cnt), depth×width rows.

    Seeded hash rows are emulated by hashing ``(key, row_index)``
    together — an independent-enough family per row index. The
    production default is JVM-native xxhash64 (the 100 TB path);
    ``engine_portable=True`` swaps in the md5-prefix bucket that
    DuckDB evaluates identically (``('0x' || substr(md5(..), 1,
    8))::BIGINT % width``), which is what lets
    events_heavy_hitters_cms carry a value-level oracle — at a
    measured ~2.7× per-event hash cost that the default does not pay.

    The per-event ×depth expansion happens in-plan (posexplode of a
    ``depth``-literal array) before the single hash shuffle; partial
    aggregation compresses each map task to at most depth×width cells
    before anything moves.
    """
    rows = F.posexplode(F.array(*[F.lit(d) for d in range(depth)]))
    return (
        df.select(F.col(key_col).alias("__k"))
        .select("__k", rows.alias("row", "__d"))
        .select(
            "row",
            _cms_bucket(
                F.col("__k"), F.col("row"), width, engine_portable
            ).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    top: int = 20,
    engine_portable: bool = False,
) -> DataFrame:
    """Exact top-``top`` keys side-by-side with their CMS estimates.

    The exact pass exists to GRADE the sketch (rows-only key +
    overestimate-bound pytest); a production heavy-hitter query keeps
    only the sketch plus a candidate stream. Estimation joins the
    ``top × depth`` candidate cells against the sketch on
    (row, bucket) — the sketch side is depth×width rows, so Spark
    broadcasts it and the probe is map-only.

    Output: (key, exact_n, cms_n, overestimate), exact-count
    descending, key ascending as the deterministic tie-break.
    """
    exact = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("key").asc())
        .limit(top)
    )
    cells = cms_cells(df, key_col, depth, width, engine_portable)
    probes = exact.select(
        "key",
        "exact_n",
        F.posexplode(F.array(*[F.lit(d) for d in range(depth)])).alias("row", "__d"),
    ).select(
        "key",
        "exact_n",
        "row",
        _cms_bucket(
            F.col("key"), F.col("row"), width, engine_portable
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("key", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
        .select(
            "key",
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cms_n").cast("long").alias("cms_n"),
            (F.col("cms_n") - F.col("exact_n")).cast("long").alias("overestimate"),
        )
        .orderBy(F.col("exact_n").desc(), F.col("key").asc())
    )


# --------------------------------------------------------------------------
# Engine-portable HyperLogLog (the cardinality sibling of the CMS above)
# --------------------------------------------------------------------------

# m = 256 registers (log2 m = 8 → first 2 md5 hex chars select the
# register); rho examines the next 12 hex chars = 48 bits, so
# rho ∈ [1, 49]. alpha_256 = 0.7213 / (1 + 1.079/256) (Flajolet et al.
# 2007). The estimate numerator alpha·m²·2⁵⁰ is ONE shared float
# literal so both engines divide the same numerator by the same exact
# integer.
HLL_M = 256
HLL_MAX_RHO = 49
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_NUMERATOR = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 50)
_TWO_POW_50 = 1 << 50


def hll_registers(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per-group HLL register table (__g, __reg, __mx): md5-addressed
    register + max(rho). Mergeable by construction — the max of two
    shards' registers equals the whole-input registers (pytest-pinned),
    which is what makes the sketch a partial aggregate at 100 TB."""
    hx = F.md5(F.col(key_col).cast("string"))
    stripped = F.regexp_replace(F.substring(hx, 3, 12), "^0*", "")
    first = F.substring(stripped, 1, 1)
    clz = (
        F.when(first.isin("8", "9", "a", "b", "c", "d", "e", "f"), F.lit(0))
        .when(first.isin("4", "5", "6", "7"), F.lit(1))
        .when(first.isin("2", "3"), F.lit(2))
        .otherwise(F.lit(3))
    )
    rho = F.when(stripped == "", F.lit(HLL_MAX_RHO)).otherwise(
        (F.lit(12) - F.length(stripped)) * 4 + clz + 1
    )
    return (
        df.select(
            F.col(group_col).alias("__g"),
            F.substring(hx, 1, 2).alias("__reg"),
            rho.alias("__rho"),
        )
        .groupBy("__g", "__reg")
        .agg(F.max("__rho").alias("__mx"))
    )


def hll_cardinality_portable(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Explicit-register HyperLogLog distinct-count per group, built
    entirely from engine-portable expressions (md5 + string ops) so a
    SQL oracle can rebuild the IDENTICAL 256 registers and estimate.

    Register math: h = md5(key); register = first 2 hex chars; rho =
    1 + leading zero BITS of the next 48 bits (4·leading-'0'-chars +
    a 4-way CASE on the first non-zero nibble). The per-group sketch
    is ``groupBy(group, register).max(rho)`` — one map-side-combining
    shuffle whose output is ≤ m rows per group, the mergeable-sketch
    property (max of maxes) falling out of the groupBy itself.

    The harmonic mean is kept EXACT until the final division: each
    register contributes 2^(50−rho) (a bigint, max 2⁵⁰), zero
    registers contribute 2⁵⁰, and the float estimate
    alpha·m²·2⁵⁰ / S happens once per group on the exact integer S —
    no float-summation order for engines to disagree on. No
    small-range correction on purpose: ln() is libm-dependent and
    this sketch exists to be value-oracled; the PRODUCTION
    cardinality path is Spark's HLL++ (events_approx_users /
    events_users_hll_rollup), which keeps its bias corrections and
    its engine-specific hash.

    Output: (group, n_users_exact, nonzero_buckets, hll_est 4dp) —
    the exact distinct count rides along to grade the estimate.
    """
    from ..functions.rounding import round_half_up

    g = F.col(group_col)
    base = df.filter(g.isNotNull() & F.col(key_col).isNotNull())
    regs = hll_registers(base, group_col, key_col)
    agg = regs.groupBy("__g").agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - __mx AS INT))")
        ).alias("__s_nonzero"),
        F.count(F.lit(1)).alias("__nz"),
    )
    exact = base.groupBy(g.alias("__g")).agg(
        F.countDistinct(key_col).cast("long").alias("n_users_exact")
    )
    s_total = F.col("__s_nonzero") + (F.lit(HLL_M) - F.col("__nz")) * F.lit(
        _TWO_POW_50
    )
    return (
        exact.join(agg, "__g")
        .select(
            F.col("__g").alias(group_col),
            "n_users_exact",
            F.col("__nz").cast("long").alias("nonzero_buckets"),
            round_half_up(
                F.lit(HLL_NUMERATOR) / s_total.cast("double"), 4
            ).alias("hll_est"),
        )
        .orderBy(group_col)
    )


# --------------------------------------------------------------------------
# t-digest-LITE: portable fixed-codepoint centroid digest
# --------------------------------------------------------------------------

#: Fixed cumulative-probability codepoints (per-mille) bounding each
#: centroid — the "scale function evaluated once" of a merging t-digest
#: (Dunning & Ertl 2019), frozen as rational literals so BOTH engines
#: assign values to centroids with exact integer arithmetic. The
#: spacing mimics the asin/K1 profile: fine at the tails (1%, 1.5%,
#: 2.5% buckets) and coarse in the middle (15%) — tail quantiles keep
#: small-weight centroids, the t-digest accuracy property.
TDIGEST_CODEPOINTS = (
    0, 10, 25, 50, 100, 200, 350, 500, 650, 800, 900, 950, 975, 990,
)


def tdigest_lite_bands(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    quantiles: "tuple[int, ...]" = (25, 50, 75, 95),
) -> DataFrame:
    """Percentile bands from an explicit t-digest-LITE: per group,
    build the fixed-codepoint centroid set (weight + mean per
    codepoint bucket) and answer quantiles by the t-digest midpoint
    interpolation rule — every step engine-portable so a DuckDB
    oracle rebuilds the IDENTICAL centroids and estimates
    (``price_bands_tdigest_portable``), value-gating the centroid /
    interpolation math under the engine-internal production sketch
    (``price_bands_sketch``, approx_percentile's t-digest).

    Deterministic-merge pin: the digest is built from the globally
    sorted value order (rank by (cents, id)), the one merge order both
    engines can agree on; centroid k owns ranks with
    ``codepoint[k] <= (rank-1)·1000/n < codepoint[k+1]``, checked as
    the exact bigint comparison ``(rank-1)·1000 >= codepoint·n``.
    Values are quantized to cents FIRST so centroid sums are exact
    bigints in any order (the embedding_cov_portable trick) and the
    mean divides identical integers in both engines.

    Quantile rule (Dunning's interpolation): centroid k sits at
    mid-cumulative-weight ``m_k = C_{k-1} + w_k/2``; a query at rank
    ``t = q·n`` interpolates linearly between the two centroids whose
    midpoints bracket t, clamping to the first/last centroid mean at
    the edges. All comparisons are scaled to integers
    (``k·n`` vs ``50·M2`` with ``M2 = 2·C - w``) — no float
    boundaries to disagree on.

    Scale: this TWIN sorts each group once (rank window) and exists
    FOR the oracle; the 100 TB production path is approx_percentile,
    whose t-digest builds bottom-up as a mergeable partial aggregate
    with no global sort. The centroid table itself (≤14 rows/group)
    and midpoint interpolation are exactly what that sketch maintains
    internally.
    """
    from pyspark.sql import Window

    from ..functions.rounding import round_half_up

    spark = df.sparkSession
    cents = F.floor(
        F.col(value_col) * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")
    vals = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        cents.alias("__cents"),
    )
    wg = Window.partitionBy("__g")
    wr = Window.partitionBy("__g").orderBy("__cents", "__id")
    ranked = vals.select(
        "__g",
        "__cents",
        F.row_number().over(wr).cast("bigint").alias("__rn"),
        F.count(F.lit(1)).over(wg).alias("__n"),
    )
    pos = (F.col("__rn") - F.lit(1)) * F.lit(1000)
    cid = None
    for i in range(len(TDIGEST_CODEPOINTS) - 1, 0, -1):
        cond = pos >= F.lit(TDIGEST_CODEPOINTS[i]) * F.col("__n")
        cid = F.when(cond, i) if cid is None else cid.when(cond, i)
    cid = cid.otherwise(0)
    cent = (
        ranked.withColumn("__cid", cid)
        .groupBy("__g", "__cid")
        .agg(
            F.max("__n").alias("__n"),
            F.count(F.lit(1)).alias("__w"),
            F.sum("__cents").alias("__sum_cents"),
        )
    )
    wc = Window.partitionBy("__g").orderBy("__cid")
    cum = cent.select(
        "__g",
        "__n",
        "__cid",
        "__w",
        (F.lit(2) * F.sum("__w").over(wc) - F.col("__w")).alias("__m2"),
        (F.col("__sum_cents") / (F.col("__w") * F.lit(100.0))).alias(
            "__mean"
        ),
        F.row_number().over(wc).alias("__crow"),
        F.count(F.lit(1)).over(wg).alias("__n_centroids"),
    )
    led = cum.select(
        "*",
        F.lead("__m2").over(wc).alias("__m2n"),
        F.lead("__mean").over(wc).alias("__meann"),
    )
    qdf = spark.createDataFrame([(int(k),) for k in quantiles], "__k int")
    kn = F.col("__k").cast("bigint") * F.col("__n")
    pair = F.when(
        (kn >= F.lit(50) * F.col("__m2"))
        & F.col("__m2n").isNotNull()
        & (kn < F.lit(50) * F.col("__m2n")),
        F.col("__mean")
        + (
            (kn - F.lit(50) * F.col("__m2")).cast("double")
            / (
                F.lit(50) * F.col("__m2n") - F.lit(50) * F.col("__m2")
            ).cast("double")
        )
        * (F.col("__meann") - F.col("__mean")),
    )
    lo = F.when(
        (F.col("__crow") == 1) & (kn < F.lit(50) * F.col("__m2")),
        F.col("__mean"),
    )
    hi = F.when(
        F.col("__m2n").isNull() & (kn >= F.lit(50) * F.col("__m2")),
        F.col("__mean"),
    )
    est = (
        led.crossJoin(F.broadcast(qdf))
        .groupBy("__g", "__k")
        .agg(
            F.max("__n").alias("__n"),
            F.max("__n_centroids").alias("__n_centroids"),
            F.coalesce(F.max(pair), F.max(lo), F.max(hi)).alias("__est"),
        )
    )
    band = [
        round_half_up(
            F.max(F.when(F.col("__k") == k, F.col("__est"))), 4
        ).alias(f"p{k}")
        for k in quantiles
    ]
    return (
        est.groupBy("__g")
        .agg(
            F.max("__n").cast("long").alias("n_parts"),
            F.max("__n_centroids").cast("int").alias("n_centroids"),
            *band,
        )
        .withColumnRenamed("__g", group_col)
        .orderBy(group_col)
    )


def tdigest_lite_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    id_col: str,
    quantiles: "tuple[int, ...]" = (25, 50, 75, 95),
) -> str:
    """DuckDB restatement of :func:`tdigest_lite_bands`, generated
    from the SAME ``TDIGEST_CODEPOINTS`` literals so the two engines
    cannot drift on centroid boundaries."""
    cases = " ".join(
        f"WHEN (rn - 1) * 1000 >= {b} * n THEN {i}"
        for i, b in sorted(
            enumerate(TDIGEST_CODEPOINTS), key=lambda t: -t[0]
        )
        if i > 0
    )
    qvals = ", ".join(f"({k})" for k in quantiles)
    bands = ",\n           ".join(
        f"round(max(CASE WHEN k = {k} THEN est END), 4) AS p{k}"
        for k in quantiles
    )
    return f"""
    WITH vals AS (
      SELECT {group_col} AS g, {id_col} AS id,
             CAST(floor({value_col} * 100.0 + 0.5) AS BIGINT) AS cents
      FROM {table}
    ),
    ranked AS (
      SELECT g, cents,
             row_number() OVER (PARTITION BY g ORDER BY cents, id) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM vals
    ),
    binned AS (
      SELECT g, n, cents, CASE {cases} ELSE 0 END AS cid
      FROM ranked
    ),
    cent AS (
      SELECT g, cid, max(n) AS n, count(*) AS w,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM binned GROUP BY g, cid
    ),
    cum AS (
      SELECT g, n, cid, w,
             2 * sum(w) OVER (PARTITION BY g ORDER BY cid) - w AS m2,
             sum_cents / (w * 100.0) AS mean,
             row_number() OVER (PARTITION BY g ORDER BY cid) AS crow,
             count(*) OVER (PARTITION BY g) AS n_centroids
      FROM cent
    ),
    led AS (
      SELECT *,
             lead(m2) OVER (PARTITION BY g ORDER BY cid) AS m2n,
             lead(mean) OVER (PARTITION BY g ORDER BY cid) AS meann
      FROM cum
    ),
    est AS (
      SELECT g, k, max(n) AS n, max(n_centroids) AS n_centroids,
             coalesce(
               max(CASE WHEN k * n >= 50 * m2 AND m2n IS NOT NULL
                         AND k * n < 50 * m2n
                        THEN mean + (CAST(k * n - 50 * m2 AS DOUBLE)
                                     / CAST(50 * m2n - 50 * m2 AS DOUBLE))
                             * (meann - mean) END),
               max(CASE WHEN crow = 1 AND k * n < 50 * m2 THEN mean END),
               max(CASE WHEN m2n IS NULL AND k * n >= 50 * m2 THEN mean END)
             ) AS est
      FROM led, (VALUES {qvals}) AS q(k)
      GROUP BY g, k
    )
    SELECT g AS {group_col}, CAST(max(n) AS BIGINT) AS n_parts,
           CAST(max(n_centroids) AS INT) AS n_centroids,
           {bands}
    FROM est GROUP BY g
    ORDER BY {group_col}
    """
