"""Per-key parity spot-check: the same hash-compare as
tools/full_parity.py, restricted to the keys named on the command
line — the builder's fast loop while adding or rewriting a key.

Usage: python tools/check_keys.py KEY [KEY...] [--sf DIR ...]
Defaults to sf0.001 AND sf0.01 (both driver-shape scales).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.full_parity import _comparable  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sfs: list[str] = []
    keys: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            try:
                sfs.append(next(it))
            except StopIteration:
                sys.exit("usage: check_keys.py KEY [KEY...] [--sf DIR ...]")
        else:
            keys.append(a)
    if not keys:
        sys.exit("usage: check_keys.py KEY [KEY...] [--sf DIR ...]")
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    from pyspark.sql import SparkSession

    from b2b_data_pipeline_indiamart_spark.catalog import TABLES
    from b2b_data_pipeline_indiamart_spark.operators import caching
    from b2b_data_pipeline_indiamart_spark.plans import ORACLE, QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("check-keys")
        .getOrCreate()
    )
    failures = 0
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        for key in keys:
            fn = QUERIES[key]
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            caching.release_cached()
            if key in ORACLE:
                res = con.execute(ORACLE[key])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                ok_schema = sorted(scols) == sorted(dcols)
                ok_hash = _comparable(scols, srows) == _comparable(dcols, drows)
                ok = ok_schema and ok_hash and len(srows) == len(drows)
                print(
                    f"{sf.rsplit('/',1)[-1]} {key}: "
                    f"{'OK' if ok else 'FAIL'} spark={len(srows)} "
                    f"duck={len(drows)} schema={ok_schema} hash={ok_hash}"
                )
                if not ok:
                    failures += 1
                    if not ok_schema:
                        print(f"  spark cols: {sorted(scols)}")
                        print(f"  duck  cols: {sorted(dcols)}")
                    else:
                        a = _comparable(scols, srows)
                        b = _comparable(dcols, drows)
                        diff = [x for x in a if x not in b][:3]
                        diff2 = [x for x in b if x not in a][:3]
                        print(f"  spark-only: {diff}")
                        print(f"  duck-only:  {diff2}")
            else:
                again = [tuple(r) for r in fn(spark, sf).collect()]
                caching.release_cached()
                det = sorted(map(str, srows)) == sorted(map(str, again))
                print(
                    f"{sf.rsplit('/',1)[-1]} {key}: rows-only "
                    f"rows={len(srows)} deterministic={det}"
                )
                if not det:
                    failures += 1
        con.close()
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
