"""Skew-machinery receipt (VERDICT r12 #4): measure plain vs salted
joins on a DELIBERATELY Zipfian hot-key table.

The registry keys that pin the skew operators (orders_salted_revenue,
orders_bloom_prune) run on NATURAL testdata, where no key is hot and
salting wins nothing — correct for value-parity, useless as evidence
that the machinery matters. This tool builds the pathological shape the
operators exist for — one key owning ~30% of a fact table, a few more
at ~5% each — deterministically from ids (xxhash64 buckets, no RNG), and
records:

- plain shuffle join, AQE OFF  (the naive worst case)
- plain shuffle join, AQE ON   (Spark's own runtime skew splitting;
  skew-split evidence scraped from the final adaptive plan)
- hybrid_salted_join, AQE OFF  (operators/skew.py:96 — salt ONLY the
  hot keys, plain-join the uniform bulk)

Broadcast is disabled throughout: at the 100 TB shape this models, the
build side does not fit (if it broadcasts, skew is a non-issue and none
of this machinery is needed).

Output: one JSON line per configuration + a summary line; paste into
NOTES.md as the round receipt. Wall times are best-of-1 on a warm
session (the join dominates; stage-level noise is ~100ms against
multi-second gaps).

Usage: python tools/skew_receipt.py [N_FACT_MILLIONS]
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DIM_KEYS = 100_000  # uniform key space for the cold bulk
HOT_SHARE = (  # (key, share of fact rows routed to it)
    (0, 30),   # the "one customer is 30% of the fact table" key
    (1, 5),
    (2, 5),
    (3, 5),
)


def build_tables(spark, n_fact: int):
    from pyspark.sql import functions as F

    bucket = F.pmod(F.xxhash64(F.col("id")), F.lit(100))
    key, lo = None, 0
    for k, share in HOT_SHARE:
        cond = bucket.between(lo, lo + share - 1)
        key = (
            F.when(cond, F.lit(k)) if key is None else key.when(cond, F.lit(k))
        )
        lo += share
    # remaining rows: uniform over the dim key space (offset past hot)
    key = key.otherwise(
        F.pmod(F.xxhash64(F.col("id"), F.lit("u")), F.lit(N_DIM_KEYS - 10))
        + F.lit(10)
    )
    facts = (
        spark.range(0, n_fact, 1, 64)
        .select(
            key.alias("k"),
            (F.pmod(F.xxhash64("id", F.lit("v")), F.lit(1000)) / 10.0)
            .alias("v"),
            # a real payload so per-partition BYTES (what AQE's skew
            # detector sees) track the row skew
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
    )
    dim = spark.range(N_DIM_KEYS).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("attr"),
    )
    return facts, dim


def timed_join(tag: str, joined) -> dict:
    from pyspark.sql import functions as F

    # materialize through an explicit aggregate frame so the plan we
    # scrape afterwards IS the executed (AQE-final) plan — a bare
    # .count() executes a different QueryExecution and the join df's
    # own plan would still read isFinalPlan=false with no skew marks
    cnt = joined.agg(F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    n = cnt.collect()[0]["n"]
    wall = round(time.perf_counter() - t0, 3)
    plan = cnt._jdf.queryExecution().executedPlan().toString()
    skewed = len(re.findall(r"skew=true", plan))
    rec = {"config": tag, "wall_sec": wall, "rows": n,
           "skew_marked_joins": skewed}
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    n_fact = int(sys.argv[1]) * 1_000_000 if len(sys.argv) > 1 else 64_000_000
    from pyspark.sql import SparkSession

    from b2b_data_pipeline_indiamart_spark.operators.skew import (
        hybrid_salted_join,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .appName("skew-receipt")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    facts, dim = build_tables(spark, n_fact)
    facts = facts.persist()
    dim = dim.persist()
    facts.count(), dim.count()  # materialize inputs outside the timing

    def set_aqe(on: bool):
        spark.conf.set("spark.sql.adaptive.enabled", str(on).lower())
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(on).lower()
        )
        # skew thresholds sized to THIS box's partitions (defaults
        # assume 256MB+ cluster partitions): a partition 5x the median
        # and >32MB splits — the same relative tuning a production
        # cluster applies
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB"
        )

    out = []
    set_aqe(False)
    out.append(timed_join("plain_join_aqe_off", facts.join(dim, "k")))
    set_aqe(True)
    out.append(timed_join("plain_join_aqe_on", facts.join(dim, "k")))
    set_aqe(False)
    out.append(
        timed_join(
            "hybrid_salted_aqe_off",
            hybrid_salted_join(
                facts, dim, ["k"], threshold=n_fact // 100, n_salts=32
            ),
        )
    )
    set_aqe(True)
    summary = {
        "metric": "skew_receipt",
        "n_fact": n_fact,
        "n_dim": N_DIM_KEYS,
        "hot_shares_pct": dict(HOT_SHARE),
        "results": {r["config"]: r["wall_sec"] for r in out},
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
