"""Column profiling operator.

Parity: reference ``etl.py`` ``build_profile_report`` (etl.py:379-400):
per-column rows / non-null / nulls / null-pct / distinct. The reference
loops columns in pandas; here ALL per-column aggregates are computed in
ONE pass over the data (a single aggregate projection), then unpivoted
into the row-per-column report shape. One job, no per-column scans —
at 100 TB this is the difference between 1 scan and N scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round_half_up


def profile_report(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """n_rows/non_null/nulls/null_pct/distinct per column, one scan.

    ``exact_distinct=False`` switches every distinct count to
    HyperLogLog++ (``approx_count_distinct``, ~2% default rsd) — the
    100 TB path: exact multi-column countDistinct expands the input
    once per column, HLL sketches merge map-side in the same single
    aggregate with O(columns) fixed-size state.
    """
    cols = df.columns
    uq = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(uq(F.col(c)).alias(f"__uq_{c}"))
    wide = df.agg(*aggs)

    # Unpivot the single wide row into (column, rows, non_null, ...) rows.
    stacks = []
    for c in cols:
        stacks.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__rows").alias("n_rows"),
                F.col(f"__nn_{c}").alias("non_null"),
                (F.col("__rows") - F.col(f"__nn_{c}")).alias("nulls"),
                round_half_up(
                    (F.col("__rows") - F.col(f"__nn_{c}")) * 100.0 / F.col("__rows"), 2
                ).alias("null_pct"),
                F.col(f"__uq_{c}").alias("distinct_values"),
            )
        )
    return (
        wide.select(F.explode(F.array(*stacks)).alias("p"))
        .select("p.column", "p.n_rows", "p.non_null", "p.nulls", "p.null_pct", "p.distinct_values")
    )


def observe_quality(
    df: DataFrame,
    name: str = "quality",
    numeric_col: str | None = None,
    required_cols: "list[str] | None" = None,
):
    """Attach free pipeline metrics to a plan via Spark's Observation
    API: row count, per-required-column null counts, and (optionally)
    a numeric column's sum/min/max are computed AS A SIDE EFFECT of
    whatever action the caller runs next — zero extra scans, zero
    extra jobs, exactly the metrics a production pipeline wants on
    every write without paying for a second pass.

    Returns ``(observed_df, observation)``; read
    ``observation.get`` AFTER an action on ``observed_df`` has
    completed. At 100 TB this is the difference between "metrics are
    free" and "metrics double the pipeline" — the aggregates ride the
    same tasks as the real work (internally an
    ``CollectMetrics`` node, mergeable per-partition accumulators).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in required_cols or []:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    if numeric_col is not None:
        metrics.extend(
            [
                F.sum(numeric_col).alias(f"sum_{numeric_col}"),
                F.min(numeric_col).alias(f"min_{numeric_col}"),
                F.max(numeric_col).alias(f"max_{numeric_col}"),
            ]
        )
    return df.observe(obs, *metrics), obs
