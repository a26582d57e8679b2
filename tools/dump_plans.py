"""Dump .explain("formatted") for a set of registry keys to files.

Usage:
    python tools/dump_plans.py <out_dir> <suffix> [key ...]

Writes ``<out_dir>/<key>_<suffix>.txt`` for each key (default: the
bench headline set). Plans are captured against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1). Explain is driver-side planning only,
so this is safe to run on a contended box.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from b2b_data_pipeline_indiamart_spark.plans import QUERIES
from b2b_data_pipeline_indiamart_spark.session import get_spark

DEFAULT_KEYS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "windowed_rank",
    "etl_pipeline_e2e",
    "events_sessionize",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "doc_quality",
    "ann_topk",
]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    keys = sys.argv[3:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        try:
            df = QUERIES[key](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
