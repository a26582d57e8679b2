"""Skew mitigation: salted joins for pathological hot keys.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles
most skew at runtime, but it only applies to sort-merge joins and only
splits the oversized partitions it can see. Salting is the explicit,
planner-independent fallback for a *known* hot key distribution — the
classic "one customer is 30% of the fact table" shape: the fact side
spreads each key over ``n_salts`` sub-keys, the (smaller) build side is
replicated ``n_salts``×, and the join runs on (key, salt) so no single
task owns a hot key.

Cost model: build-side shuffle volume multiplies by ``n_salts`` — use
the smallest salt count that flattens the skew, and only when the build
side is modest (if it broadcasts, skew is a non-issue: broadcast joins
don't partition by key at all).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``facts`` ⋈ ``build`` on ``on``, salted ``n_salts`` ways.

    Result rows are identical to ``facts.join(build, on, how)`` — the
    salt only changes the partitioning. The fact side's salt can be any
    value in [0, n_salts); a hash of the whole row spreads a hot key's
    rows uniformly and deterministically (no rand(), so re-runs and
    retried tasks agree). Supported ``how``: inner / left — the
    fact-preserving shapes salting is for (right/full would need the
    build side de-replicated afterwards).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts))
    salted_facts = facts.withColumn("__salt", salt.cast("int"))
    salted_build = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_facts.join(salted_build, [*on, "__salt"], how)
    return out.drop("__salt")
