"""Bloom-filter join pruning — the runtime-filter pattern, built from
public DataFrame primitives.

At 100 TB the dominant cost of ``fact ⋈ keys`` is shuffling fact rows
that can never match. When the key set is too large to broadcast raw
but its BLOOM BITS fit in a few KB, the production move (Spark's own
runtime row-group filters, and every warehouse engine's "join filter
pushdown") is: build the filter over the key side, broadcast the bits,
and drop non-candidate fact rows MAP-SIDE before the shuffle. False
positives survive the prefilter and are removed by the exact join that
follows — the optimization can change performance, never results,
which is why the registry key pins it against the plain-join oracle
(same contract as ``skew.hybrid_salted_join``).

``bloom_filter_agg`` exists in Spark's SQL layer only as an internal
(injected-by-the-optimizer) function, so the filter here is stated
with public expressions end to end:

- positions: ``xxhash64(key, seed_i) pmod m`` for k seeds (the
  standard k-independent-hash construction);
- build: explode the k positions, map each to (word = pos div 64,
  mask = 1 << (pos mod 64)), ``bit_or(mask)`` per word — one
  distinct-key-scale shuffle into at most m/64 tiny rows;
- pack: ``map_from_entries(collect_list(...))`` into a ONE-ROW frame
  that stays in the plan and broadcasts (never a driver round-trip);
- probe: map-side conjunction of the k bit tests against the
  broadcast map (missing word == all-zero word).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # cast to long BEFORE hashing: xxhash64 is type-sensitive (INT 7
    # and BIGINT 7 hash differently), so without a common type a fact
    # side typed int against a key side typed long would never collide
    # in the filter and every true match would be dropped map-side.
    # The probe side applies the identical cast.
    key = key.cast("long")
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 4
) -> DataFrame:
    """One-row DataFrame ``(__bloom: map<int, long>)`` of set words."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("__p")
    )
    words = pos.groupBy((F.col("__p") / 64).cast("int").alias("__w")).agg(
        F.expr("bit_or(shiftleft(1L, cast(__p % 64 as int)))").alias("__bits")
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__w"), F.col("__bits")))
        ).alias("__bloom")
    )


def bloom_might_contain(
    bloom_sql: str, key_sql: str, m_bits: int = 1 << 16, k: int = 4
) -> Column:
    """True iff every one of the k bits for the key is set.

    Stated as a SQL expression because ``shiftleft``'s shift amount is
    literal-only through the Python column API; the generated
    expression is ordinary Catalyst (WholeStageCodegen-able).
    """
    tests = []
    for i in range(k):
        # same bigint cast as the build side (xxhash64 is type-sensitive)
        pos = f"pmod(xxhash64(cast({key_sql} as bigint), {i}), {m_bits})"
        word = f"coalesce(element_at({bloom_sql}, cast({pos} div 64 as int)), 0L)"
        mask = f"shiftleft(1L, cast(pmod({pos}, 64) as int))"
        tests.append(f"({word} & {mask}) != 0")
    return F.expr(" AND ".join(tests))


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """``fact LEFT SEMI JOIN keys`` with a bloom prefilter on fact.

    The prefilter drops definite non-matches before the shuffle; the
    exact LEFT SEMI join then removes the bloom's false positives, so
    the result set is IDENTICAL to the plain semi join at any (m, k).
    """
    bits = bloom_build(keys, keys_key, m_bits, k)
    pruned = fact.crossJoin(F.broadcast(bits)).filter(
        bloom_might_contain("__bloom", fact_key, m_bits, k)
    )
    return pruned.drop("__bloom").join(
        keys.select(keys_key),
        F.col(fact_key) == F.col(keys_key),
        "left_semi",
    )
