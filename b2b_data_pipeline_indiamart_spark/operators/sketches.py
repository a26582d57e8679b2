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
