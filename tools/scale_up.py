"""Synthesize a larger BENCH-ONLY scale point by tiling the driver's
sf0.1 tables (VERDICT r9 item 8: every shipped sf dir is tiny, so the
2x perf gate is startup-overhead-dominated; a 10x point makes the
headline measure actual scan/shuffle/agg work).

This is strictly a bench input — correctness gates (driver window,
full parity, oracle pytest) stay on the UNTOUCHED /root/testdata dirs.
Tiling preserves the generator's distributions exactly within each
replica and remaps every primary/foreign key by a per-replica stride,
so join fan-outs, group cardinalities per key, and skew shape scale
linearly — the property a throughput benchmark needs. Two deliberate
de-dup tweaks keep workload character at 1x rates instead of
inflating to 90% duplicates: document text gets a per-replica suffix
(n_chars updated when it tracked len(text)), and embeddings get a
1e-4·replica nudge on coordinate 0 (norms/geometry effectively
unchanged, exact-duplicate vectors don't explode 10x).

Usage: python tools/scale_up.py [K] [OUT_DIR]
  K        replicas of sf0.1 (default 10 → "sf1")
  OUT_DIR  default /root/repo/spark-warehouse/sf1

bench.py auto-detects OUT_DIR and, when present, emits an extra
"headline_sf1" JSON line (never the LAST line — the driver's parsed
headline record stays the frozen compact object).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"

#: table -> (primary key, {fk column -> key-space table})
KEYMAP: dict[str, tuple[str | None, dict[str, str]]] = {
    "region": (None, {}),
    "nation": (None, {}),
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (None, {"l_orderkey": "orders",
                        "l_partkey": "part",
                        "l_suppkey": "supplier"}),
    "events": ("event_id", {"user_id": "events_user"}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}


def build(out_dir, k: int = 10, spark=None) -> None:
    """Tile SRC into ``out_dir`` (callable from bench.py with its warm
    session — VERDICT r10 #3: the sf1 bench line needs driver
    provenance, so bench builds the gitignored dir when absent)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from b2b_data_pipeline_indiamart_spark import catalog

    own_session = spark is None
    if own_session:
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .appName("scale-up")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    # per-key-space stride = 1 + max id in the source, so replica i's
    # ids live in [i*stride, (i+1)*stride) and never collide
    strides: dict[str, int] = {}
    for t, (pk, _) in KEYMAP.items():
        if pk is not None:
            mx = catalog.load(spark, SRC, t).agg(F.max(pk)).first()[0]
            strides[t] = int(mx) + 1
    strides["events_user"] = int(
        catalog.load(spark, SRC, "events").agg(F.max("user_id")).first()[0]
    ) + 1

    rep = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__rep")
    for t, (pk, fks) in KEYMAP.items():
        df = catalog.load(spark, SRC, t)
        if pk is None and not fks:  # fixed dims: copy once, no tiling
            out = df
        else:
            out = df.select("*", rep)
            if pk is not None:
                out = out.withColumn(
                    pk, F.col(pk) + F.col("__rep") * F.lit(strides[t])
                )
            for col, space in fks.items():
                out = out.withColumn(
                    col, F.col(col) + F.col("__rep") * F.lit(strides[space])
                )
            if t == "documents":
                suffix = F.when(F.col("__rep") > 0,
                                F.concat(F.lit(" r"), F.col("__rep"))
                                ).otherwise(F.lit(""))
                tracked = F.col("n_chars") == F.length("text")
                out = out.withColumn("text", F.concat("text", suffix))
                out = out.withColumn(
                    "n_chars",
                    F.when(tracked, F.length("text")).otherwise(
                        F.col("n_chars")
                    ).cast("long"),
                )
            if t == "embeddings":
                nudge = F.col("__rep").cast("double") * F.lit(1.0e-4)
                out = out.withColumn(
                    "embedding",
                    F.concat(
                        F.array(F.element_at("embedding", 1) + nudge),
                        F.slice(
                            "embedding", 2, F.size("embedding") - 1
                        ),
                    ),
                )
            out = out.drop("__rep")
        n = out.count()
        (out.repartition(8)
            .write.mode("overwrite")
            .parquet(str(out_dir / f"{t}.parquet")))
        print(f"{t}: {n} rows", flush=True)
    print(f"done in {time.time() - t0:.1f}s -> {out_dir}", flush=True)
    if own_session:
        spark.stop()


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        REPO / "spark-warehouse" / "sf1"
    )
    build(out_dir, k)


if __name__ == "__main__":
    main()
