"""Outlier handling: IQR winsorization and top-percent extraction.

Parity: reference ``etl.py`` ``iqr_bounds``/``winsorize_series``
(etl.py:210-222) and ``reports/outliers_top_1pct_prices.csv``.

Scale notes
-----------
``winsorize`` needs global quantiles. Two modes:

- ``exact=True`` — Spark SQL ``percentile`` (sort-based exact with
  linear interpolation, identical definition to DuckDB
  ``quantile_cont``). Used for oracle parity at test SFs.
- ``exact=False`` — ``approx_percentile`` (t-digest, single pass,
  mergeable) — the 100 TB path: no global sort, bounded memory.

``top_fraction`` is rank-based (row_number over a global ordering) so
the cut is deterministic under ties; the 100 TB path would first
pre-filter with an approximate threshold so the global window only
sees a sliver of the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantiles(df: DataFrame, col: str, probs: Sequence[float], exact: bool = True):
    """Return a 1-row DataFrame of the requested quantiles (q_0, q_1, …)."""
    fn = "percentile" if exact else "approx_percentile"
    aggs = [
        F.expr(f"{fn}({col}, {p})").alias(f"q_{i}") for i, p in enumerate(probs)
    ]
    return df.agg(*aggs)


def winsorize(df: DataFrame, col: str, out_col: str | None = None, exact: bool = True) -> DataFrame:
    """Clip ``col`` to [q1 - 1.5*IQR, q3 + 1.5*IQR] (etl.py:210-222).

    The 1-row bounds frame is broadcast-crossjoined — no shuffle of the
    fact side, the clip is a map-side projection.
    """
    out_col = out_col or f"{col}_winsor"
    bounds = (
        quantiles(df, col, (0.25, 0.75), exact=exact)
        .select(
            (F.col("q_0") - 1.5 * (F.col("q_1") - F.col("q_0"))).alias("__lo"),
            (F.col("q_1") + 1.5 * (F.col("q_1") - F.col("q_0"))).alias("__hi"),
        )
    )
    joined = df.crossJoin(F.broadcast(bounds))
    # pandas clip propagates both NULL and NaN; Spark's greatest/least
    # skip NULLs and order NaN as the LARGEST double (it would clip to
    # __hi) — guard both so they pass through unchanged.
    clipped = F.when(
        F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double")),
        F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi")),
    ).otherwise(F.col(col))
    return joined.withColumn(out_col, clipped).drop("__lo", "__hi")


def top_fraction(df: DataFrame, order_col: str, tiebreak: str, fraction: float = 0.01) -> DataFrame:
    """Deterministic top-``fraction`` rows by ``order_col`` desc.

    Rank-based (not threshold-based) so engine-to-engine float noise
    cannot move the cut line: rn <= ceil(n * fraction) with an explicit
    tiebreak column.
    """
    w = Window.orderBy(F.col(order_col).desc(), F.col(tiebreak).asc())
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * fraction))
        .drop("__rn", "__n")
    )
