"""Temporal / event-stream operators (batch form).

The streaming forms live in ``streaming/``; these batch operators share
the same logical shape so results are comparable.

Scale notes: tumbling aggregation shuffles once on (bucket, type) —
low cardinality, partial-agg friendly. Sessionization shuffles once on
user_id (the partition key of the window); within a user the sort is
local. Skewed users are split by AQE only for joins, so a genuinely
pathological power-user would be handled by salting the session window
key — documented, not needed at test SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_half_up


def tumbling_agg(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """Tumbling-window count/sum per event_type.

    Epoch-aligned buckets via date_trunc — identical semantics to
    ``window(ts, '1 hour')`` for epoch-aligned widths, and directly
    expressible in any SQL oracle.
    """
    return (
        events.withColumn("bucket_ts", F.date_trunc(bucket, F.col("ts")))
        .groupBy(
            F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            round_half_up(F.sum("value"), 2).alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap
    since the previous event of the same user exceeds ``gap_minutes``.

    lag + cumulative-sum-of-boundaries over (user, time) — the classic
    single-shuffle formulation.
    """
    gap_ms = gap_minutes * 60 * 1000
    w_user = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ms = F.unix_millis(F.col("ts"))
    with_breaks = events.withColumn(
        "__new_session",
        F.when(
            F.lag(ms).over(w_user).isNull() | ((ms - F.lag(ms).over(w_user)) > gap_ms),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_cum = w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_ids = with_breaks.withColumn(
        "session_id", F.sum("__new_session").over(w_cum).cast("long")
    )
    return (
        with_ids.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.unix_millis("ts")) - F.min(F.unix_millis("ts"))).alias("session_ms"),
            round_half_up(F.sum("value"), 2).alias("sum_value"),
        )
    )


def parse_props(events: DataFrame, json_col: str = "props", key: str = "k") -> DataFrame:
    """JSON props extraction + per-type aggregate (get_json_object is a
    JVM intrinsic — no Python in the path)."""
    v = F.get_json_object(F.col(json_col), f"$.{key}").cast("int")
    return (
        events.withColumn("k_value", v)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            round_half_up(F.avg("k_value"), 4).alias("avg_k"),
            F.sum(F.when(F.col("k_value").isNull(), 1).otherwise(0)).cast("long").alias("null_k"),
        )
    )
