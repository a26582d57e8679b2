"""One-shot builder for the sf100 bench-only warehouse (VERDICT r16
#10: the third decade of scale evidence for the headline set).

Tiles /root/testdata/sf0.1 by k=1000 via tools/scale_up (same salting
/ signed-rotation guarantees, documented there) into a gitignored
warehouse dir. Run standalone; the bench's sf100 leg is then driven
manually with SPARK_GRAFT_BENCH_KEYS=<headline set> and
SPARK_GRAFT_SF_DIR=<out dir> so the frozen driver methodology times it
with zero harness changes.

Usage: python tools/build_sf100.py [OUT_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools import scale_up  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "spark-warehouse" / "sf100"
    )
    from pyspark.sql import SparkSession

    # local[32] + a large heap: the k=1000 lineitem write is 600 M
    # rows; scale_up's own-session default (local[8]/20g) is sized for
    # the k=100 build and would take ~4x the wall clock here.
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("scale-up-sf100")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    scale_up.build(out_dir, k=1000, spark=spark)
    spark.stop()


if __name__ == "__main__":
    main()
