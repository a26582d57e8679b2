"""Cleaning / standardization operators (DataFrame -> DataFrame).

Parity: reference ``etl.py`` pipeline steps ``standardize_fields``
(etl.py:257-274), ``handle_missing_values`` (etl.py:349-355),
``deduplicate`` (etl.py:358-368), ``drop_critical_missing``
(etl.py:371-376), ``validate_and_collect_issues`` (etl.py:315-346),
``curate_final_dataset`` (etl.py:403-408).

All operators are pure Catalyst plans: no Python UDFs, no collect().
Dedup is the only shuffling op (hash partition on the dedup key) —
exactly the shuffle the semantics require, nothing more.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import clean_text


def standardize_strings(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Apply ``clean_text`` to every (or the given) string column.

    Parity: etl.py:257-262 — the reference maps ``clean_text`` over all
    object columns; here it is a single projection, fully codegen'd.
    """
    cols = columns or [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    out = df
    for c in cols:
        out = out.withColumn(c, clean_text(F.col(c)))
    return out


def fill_unknown(df: DataFrame, columns: Sequence[str], value: str = "Unknown") -> DataFrame:
    """Selective fill of missing categorical fields (etl.py:349-355)."""
    return df.fillna({c: value for c in columns})


def drop_critical_missing(df: DataFrame, required: Sequence[str]) -> DataFrame:
    """Drop rows missing any required field (etl.py:371-376)."""
    cond = None
    for c in required:
        this = F.col(c).isNotNull()
        cond = this if cond is None else (cond & this)
    return df.filter(cond) if cond is not None else df


def dedup_keep_first(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """Key-based dedup with a *deterministic* keep-first.

    Parity: etl.py:358-368 (``drop_duplicates(keep="first")``). The
    reference's "first" is input-file order; in a distributed engine
    input order is not a stable concept, so the caller provides an
    explicit ``order_by`` that defines "first" (e.g. min line number).
    Implemented as row_number over a window — one shuffle on ``keys``,
    which is the minimum the semantics admit. At 100 TB this is a hash
    repartition on the dedup key; AQE splits skewed keys.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_first_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    payload: Sequence[str],
) -> DataFrame:
    """Keep-first dedup as ``groupBy(keys).agg(min(struct(...)))``.

    Same result as :func:`dedup_keep_first` when ``order_cols`` are
    ascending AND unique per row (e.g. a primary key): the struct min
    is lexicographic, so ordering fields come first and ``payload``
    fields are carried along (they can only influence selection on a
    total tie of the order columns).

    Scale rationale: the window formulation shuffles EVERY row and
    sorts each partition; this formulation gets map-side partial
    aggregation — duplicate groups collapse before the shuffle, so
    shuffle volume is O(distinct keys), and there is no sort at all.
    At a 9:1 dup ratio that is a 9× shuffle reduction; the higher the
    duplication (the common case for dedup!), the bigger the win.
    Output columns: keys + order_cols + payload.
    """
    first = F.min(F.struct(*[F.col(c) for c in [*order_cols, *payload]])).alias("__first")
    return df.groupBy(*[F.col(k) for k in keys]).agg(first).select(
        *keys, *[F.col(f"__first.{c}").alias(c) for c in [*order_cols, *payload]]
    )


def curate(df: DataFrame, final_columns: Sequence[str]) -> DataFrame:
    """Guarantee exact output column set + order (etl.py:403-408).

    Missing columns materialize as NULL strings; extra columns are
    pruned (and thanks to column pruning, never even read from disk).
    """
    existing = set(df.columns)
    cols = [
        F.col(c) if c in existing else F.lit(None).cast("string").alias(c)
        for c in final_columns
    ]
    return df.select(*cols)


def collect_quality_issues(df: DataFrame, checks: dict[str, Column], key: Column) -> DataFrame:
    """Row-level validation: one output row per (key, failed check).

    Parity: etl.py:315-346 (``validate_and_collect_issues``). The
    reference iterates rows in Python; here each check is a filter +
    projection and the issue table is a union of Catalyst plans — the
    scan is shared via the underlying relation, and each branch pushes
    its own predicate down.

    ``checks`` maps issue-name -> boolean Column that is TRUE when the
    row *fails* the check.
    """
    parts = [
        df.filter(cond).select(key.cast("long").alias("row_key"), F.lit(name).alias("issue"))
        for name, cond in checks.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
