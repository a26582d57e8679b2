"""Full-registry correctness artifact: the driver's hash-compare, run
locally over EVERY registry key (the external driver grades a bounded
prefix of ``queries()``; this writes the same evidence for all keys).

Usage: python tools/full_parity.py [round_tag] [sf_dir]
Writes PARITY_FULL_{round_tag}.json at the repo root with, per key:
rows_match / schema_match / hash_match vs the DuckDB oracle (oracle
keys) or rows + determinism across two runs (rows-only keys).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v + 0.0)
    return repr(v) if isinstance(v, int) else str(v)


def _comparable(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


#: rows-only outputs above this size use the distributed fingerprint
#: instead of a 2x driver collect (dedup_minhash_lsh at sf1 emits 31 M
#: candidate pairs — collecting that through py4j twice is exactly the
#: driver-side anti-pattern the engine bans)
_BIG_ROWS = 2_000_000

#: ORACLE outputs above this size switch from the repr-tuple canon
#: (python objects: a 6 M-row orders-grain key at sf10 ballooned a
#: shard past 48 GB RSS and got it OOM-killed — r14) to the Arrow /
#: pandas path below: both sides land as columnar frames, are sorted
#: with pandas.sort_values over every column (the DRIVER's own
#: canonicalizer), and compared column-vectorized. Overridable for
#: equivalence testing via SPARK_GRAFT_PARITY_BIG_ORACLE_ROWS.
_BIG_ORACLE_ROWS = 500_000


def _arrow_kind(t):
    """Normalized logical kind of an Arrow type, mirroring the
    repr-tuple canon's equivalence classes: Python ints compare equal
    regardless of width (int64 == HUGEINT/decimal-scale-0), floats
    are their own class (repr(5.0) != repr(5)), bools are NOT ints
    (repr(True) != '1'), decimals with scale > 0 are distinct from
    floats (str('5.00') != repr(5.0))."""
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return "int" if t.scale == 0 else "decimal"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    return str(t)


def _pandas_compare(sdf, con, sql):
    """Memory-safe hash-compare for big oracle outputs: Spark side via
    toArrow() (columnar, ~50× smaller than Row objects), DuckDB side
    via .arrow(); both sorted by every column with pandas.sort_values
    (NaN last, the driver canon) and compared vectorized. Returns the
    same record shape as the repr-tuple path; equivalence of the two
    paths is pinned by tests/test_round14_ops.py on small data.

    schema_match requires column NAMES and normalized logical KINDS
    (int vs float vs bool vs decimal vs string, from the Arrow
    schemas — null-robust, unlike pandas dtypes) to agree, so a
    Spark BIGINT vs oracle DOUBLE (5 vs 5.0) fails here exactly as
    it would under the repr-tuple canon; the per-column dtype pairs
    are recorded in the artifact for audit."""
    import numpy as np

    sat = sdf.toArrow()
    res = con.execute(sql)
    dat = res.arrow()
    skinds = {f.name: _arrow_kind(f.type) for f in sat.schema}
    dkinds = {f.name: _arrow_kind(f.type) for f in dat.schema}
    spd = sat.to_pandas()
    dpd = dat.to_pandas()
    scols, dcols = sorted(spd.columns), sorted(dpd.columns)
    rec = {
        "rows_match": len(spd) == len(dpd),
        "schema_match": scols == dcols
        and all(skinds[c] == dkinds[c] for c in scols),
        "hash_match": False,
        "spark_rows": int(len(spd)),
        "oracle_rows": int(len(dpd)),
        "err": None,
        "pandas_compared": True,
        "dtypes": {
            c: [skinds.get(c), dkinds.get(c)]
            for c in sorted(set(scols) | set(dcols))
        },
    }
    if not (rec["rows_match"] and rec["schema_match"]):
        return rec
    spd = spd[scols].sort_values(scols, kind="mergesort").reset_index(drop=True)
    dpd = dpd[dcols].sort_values(dcols, kind="mergesort").reset_index(drop=True)
    for c in scols:
        a, b = spd[c], dpd[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            av, bv = a.astype("float64").values, b.astype("float64").values
            # exact equality after the registry's own rounding; NaN==NaN;
            # -0.0 == 0.0 under IEEE ==, matching the repr(+0.0) collapse
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
        else:
            av, bv = a.values, b.values
            eq = (av == bv) | (
                (a.isna().values if hasattr(a, "isna") else False)
                & (b.isna().values if hasattr(b, "isna") else False)
            )
        if not bool(np.all(eq)):
            return rec
    rec["hash_match"] = True
    return rec


def _fingerprint(df):
    """Order-independent determinism fingerprint computed ON the
    executors: xxhash64 over every column's string form per row,
    folded with two modular sums + count. Two runs of a deterministic
    query produce identical fingerprints; no rows reach the driver."""
    from pyspark.sql import functions as F

    h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    m1, m2 = 2_000_000_011, 1_999_999_973  # ~2e9 primes: sum < 2^63
    row = df.select(
        F.pmod(h, F.lit(m1)).alias("h1"), F.pmod(h, F.lit(m2)).alias("h2")
    ).agg(
        F.sum("h1").alias("s1"),
        F.sum("h2").alias("s2"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return (row["s1"], row["s2"], row["n"])


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r0"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    from b2b_data_pipeline_indiamart_spark.catalog import TABLES
    from b2b_data_pipeline_indiamart_spark.plans import ORACLE, QUERIES

    # SPARK_GRAFT_PARITY_PARTITIONS lets a second pass run every key
    # under a different shuffle partitioning — a value-level
    # partitioning-invariance sweep that catches order-sensitive float
    # reductions sitting on a rounding boundary (the r10
    # events_session_stats flake class) before the driver does.
    import os

    nparts = os.environ.get("SPARK_GRAFT_PARITY_PARTITIONS", "8")
    # default heap OOMs on the sf1 tiled tables (6 M lineitem); the
    # driver's gate runs at sf0.01 where 4g is ample headroom
    mem = os.environ.get("SPARK_GRAFT_PARITY_DRIVER_MEM", "4g")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", nparts)
        .config("spark.driver.memory", mem)
        # the Arrow big-output path collects up to ~10 M-row frames
        # (1-2 GB serialized) — the 1 GB default records a spurious
        # FAIL (maxResultSize) instead of a verdict
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.ui.enabled", "false")
        .appName("full-parity")
        .getOrCreate()
    )
    import os as _os

    def _connect():
        # Bound DuckDB's buffer pool and temp spill, and rebuild the
        # connection periodically (below): the r13 sf1 sweep showed a
        # single long-lived connection accumulating buffer-pool state
        # across ~200 heavy MATERIALIZED oracles until a recursive-CTE
        # key spilled ~75 GB of temp, filled the disk, and poisoned
        # every subsequent key with spurious OOMs — environmental
        # failures masquerading as parity failures.
        c = duckdb.connect()
        # PRIVATE spill dir per process: concurrent sweeps sharing the
        # cwd-relative default `.tmp` clean up each other's files and
        # abort the whole process with a C++ IOException (r14 shard
        # crash) — collision-proof the temp path
        import tempfile as _tf

        c.execute(
            "SET temp_directory = "
            f"'{_tf.mkdtemp(prefix='duck_parity_tmp_')}'"
        )
        c.execute(
            "SET memory_limit = "
            f"'{_os.environ.get('SPARK_GRAFT_PARITY_DUCK_MEM', '32GB')}'"
        )
        c.execute(
            "SET max_temp_directory_size = "
            f"'{_os.environ.get('SPARK_GRAFT_PARITY_DUCK_TMP', '40GiB')}'"
        )
        for t in TABLES:
            # driver testdata ships single files; scale_up.py output
            # (sf1) is a directory of part files — glob in that case
            p = f"{sf}/{t}.parquet"
            if Path(p).is_dir():
                p = f"{p}/*.parquet"
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
        return c

    con = _connect()

    # Optional per-key wall budget (seconds). At the tiled sf1 point a
    # few pair-family DuckDB oracles go quadratic (tiling multiplies
    # every near-dup family by K, so md5-block/LSH pair counts grow
    # ~K^2 — dedup_clusters_blocked's WITH RECURSIVE ran >20 min); a
    # budgeted key is recorded as err="key_budget_exceeded" instead of
    # wedging the whole artifact. Enforced via a watchdog thread that
    # interrupts DuckDB and cancels Spark jobs.
    budget = float(os.environ.get("SPARK_GRAFT_PARITY_KEY_TIMEOUT", "0"))

    import threading

    def _with_budget(body):
        if not budget:
            return body()
        done = threading.Event()

        def watchdog():
            if not done.wait(budget):
                # ADVICE r11: re-check done before EACH cancel — if
                # body() returned exactly as the budget elapsed, an
                # unconditional interrupt would land on the NEXT key's
                # query and record a spurious failure.
                if not done.is_set():
                    try:
                        con.interrupt()
                    except Exception:  # noqa: BLE001
                        pass
                if not done.is_set():
                    try:
                        spark.sparkContext.cancelAllJobs()
                    except Exception:  # noqa: BLE001
                        pass

        t = threading.Thread(target=watchdog, daemon=True)
        t.start()
        try:
            return body()
        finally:
            done.set()
            # join WITHOUT timeout: the next key must not start while
            # a cancel could still be in flight (same ADVICE race).
            # After done.set() the watchdog exits promptly — either its
            # wait() wakes immediately or the two is_set() gates skip
            # the cancel calls, so this join is bounded in practice.
            t.join()

    # SPARK_GRAFT_PARITY_KEYS="k1,k2" restricts the run to a subset —
    # used to re-grade budget-skipped keys with a per-key budget far
    # above the full-sweep default (the r12 sf1 evidence-gap close);
    # tools/merge_parity.py folds the subset artifact into the full one.
    only = os.environ.get("SPARK_GRAFT_PARITY_KEYS", "")
    keys = dict(QUERIES)
    if only:
        wanted = [s.strip() for s in only.split(",") if s.strip()]
        missing = [w for w in wanted if w not in keys]
        if missing:
            raise SystemExit(f"unknown keys: {missing}")
        keys = {w: QUERIES[w] for w in wanted}

    out: dict[str, dict] = {}
    t0 = time.time()
    for n_done, (key, fn) in enumerate(keys.items()):
        if n_done and n_done % 40 == 0:
            # fresh connection every 40 keys — see _connect()
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass
            con = _connect()
        rec: dict = {}
        t_key = time.time()

        def _body():
            sdf = fn(spark, sf)
            scols = sdf.columns
            if key not in ORACLE and sdf.count() > _BIG_ROWS:
                fp1 = _fingerprint(fn(spark, sf))
                fp2 = _fingerprint(fn(spark, sf))
                return {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": fp1[2],
                    "oracle_rows": None,
                    "deterministic": fp1 == fp2,
                    "err": "no_oracle",
                    "fingerprinted": True,
                }
            if key in ORACLE:
                big_cut = int(
                    _os.environ.get(
                        "SPARK_GRAFT_PARITY_BIG_ORACLE_ROWS",
                        str(_BIG_ORACLE_ROWS),
                    )
                )
                n_oracle = con.execute(
                    f"SELECT count(*) FROM ({ORACLE[key]})"
                ).fetchone()[0]
                if n_oracle > big_cut:
                    return _pandas_compare(sdf, con, ORACLE[key])
            srows = [tuple(r) for r in sdf.collect()]
            if key in ORACLE:
                res = con.execute(ORACLE[key])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                return {
                    "rows_match": len(srows) == len(drows),
                    "schema_match": sorted(scols) == sorted(dcols),
                    "hash_match": _comparable(scols, srows) == _comparable(dcols, drows),
                    "spark_rows": len(srows),
                    "oracle_rows": len(drows),
                    "err": None,
                }
            again = [tuple(r) for r in fn(spark, sf).collect()]
            return {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": len(srows),
                "oracle_rows": None,
                "deterministic": sorted(map(str, srows)) == sorted(map(str, again)),
                "err": "no_oracle",
            }

        try:
            rec = _with_budget(_body)
        except Exception as exc:  # noqa: BLE001 — artifact must record failures
            err = f"{type(exc).__name__}: {exc}"[:500]
            if budget and time.time() - t_key >= budget:
                err = (
                    f"key_budget_exceeded ({budget:.0f}s): "
                    + err[:300]
                )
            rec = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": err,
            }
            # a heavy key can kill the JVM (executor OOM / interrupted
            # shutdown); every later key then fails in milliseconds and
            # the artifact fills with spurious FAILs (two r14 sweep
            # cascades). Probe the session; if it is dead, write the
            # partial artifact and ABORT so a resume run (ok-keys
            # parsed from the log) continues on a fresh JVM.
            try:
                spark.range(1).count()
            except Exception:  # noqa: BLE001
                out[key] = rec
                print(f"{key}: FAIL (session dead — aborting sweep)",
                      flush=True)
                (REPO / f"PARITY_FULL_{tag}.json").write_text(json.dumps(
                    {"summary": {"partial": True, "aborted": "dead JVM",
                                 "keys_done": len(out)},
                     "keys": out}, indent=1))
                raise SystemExit(2)
        out[key] = rec
        if rec.get("fingerprinted"):
            status = "ok (fingerprint)"
        elif rec.get("hash_match") or rec.get("err") == "no_oracle":
            status = "ok"
        elif (rec.get("err") or "").startswith("key_budget_exceeded"):
            status = "SKIP (budget)"
        else:
            status = "FAIL"
        print(f"{key}: {status}", flush=True)
        if len(out) % 20 == 0:  # crash/timeout-safe partial artifact
            (REPO / f"PARITY_FULL_{tag}.json").write_text(json.dumps(
                {"summary": {"partial": True, "keys_done": len(out)},
                 "keys": out}, indent=1))

    oracle_keys = [k for k in out if k in ORACLE]
    summary = {
        "sf_dir": sf,
        "elapsed_sec": round(time.time() - t0, 1),
        "total_keys": len(out),
        "oracle_keys": len(oracle_keys),
        "hash_pass": sum(1 for k in oracle_keys if out[k]["hash_match"]),
        "rows_only": len(out) - len(oracle_keys),
        "rows_only_deterministic": sum(
            1 for k in out if out[k].get("err") == "no_oracle" and out[k].get("deterministic")
        ),
        "budget_skipped": sum(
            1 for k in out
            if (out[k].get("err") or "").startswith("key_budget_exceeded")
        ),
    }
    path = REPO / f"PARITY_FULL_{tag}.json"
    path.write_text(json.dumps({"summary": summary, "keys": out}, indent=1))
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
