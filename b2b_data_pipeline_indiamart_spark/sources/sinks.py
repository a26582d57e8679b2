"""Sinks: parquet (partitioned), CSV, JSON, SQLite.

Reference parity: etl.py:411-435 (``export_outputs``) writes the
curated CSV with ``na_rep="NaN"`` in ``utf-8-sig`` plus an optional
SQLite table. At 100 TB the real sinks are partitioned parquet and a
warehouse JDBC write; CSV/JSON/SQLite are kept for drop-in parity with
the reference's outputs and are documented as small-result sinks.
"""

from __future__ import annotations

import sqlite3
from typing import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """The scale sink. ``partition_by`` (e.g. region / date) gives
    downstream readers partition pruning; writes stay fully parallel —
    one file per task per partition value."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: Sequence[str],
    *,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table for co-located joins.

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT an exchange on either side — the shuffle is paid once
    at write time and amortized over every subsequent join/aggregation
    on that key. This is the stage-table layout for the repeated
    fact⋈fact joins (orders⋈lineitem on orderkey) at 100 TB; `sortBy`
    additionally pre-sorts within buckets so sort-merge joins skip the
    sort. Registered through the session catalog (`saveAsTable`) —
    bucketing metadata lives in the catalog, not the files.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    na_rep: str = "NaN",
    header: bool = True,
    single_file: bool = False,
    mode: str = "overwrite",
    encoding: str = "utf-8",
) -> None:
    """CSV export with literal ``na_rep`` for nulls (etl.py:429-430
    writes ``na_rep="NaN"`` "so you can SEE missing values").
    ``single_file`` coalesces to one partition — only for curated /
    report-sized outputs; the default keeps one file per partition.

    ``encoding="utf-8-sig"`` matches the reference's Excel-friendly
    export (etl.py:429): the JVM has no BOM-writing charset, so the
    files are written UTF-8 and the three-byte BOM is prepended to each
    part file afterwards — a per-file O(1) driver-side touch-up meant
    for the same curated/report-sized outputs as ``single_file``.
    """
    bom = encoding.lower() in ("utf-8-sig", "utf_8_sig")
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode(mode)
        .option("header", str(header).lower())
        .option("nullValue", na_rep)
        .option("emptyValue", na_rep)
        .option("encoding", "UTF-8" if bom else encoding)
        .csv(path)
    )
    if bom:
        import os

        for name in os.listdir(path):
            if not name.endswith(".csv"):
                continue
            full = os.path.join(path, name)
            with open(full, "rb") as f:
                data = f.read()
            if not data.startswith(b"\xef\xbb\xbf"):
                with open(full, "wb") as f:
                    f.write(b"\xef\xbb\xbf" + data)


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    *,
    if_exists: str = "replace",
    batch_size: int = 10_000,
) -> int:
    """SQLite sink (etl.py:430-434 ``to_sql(..., if_exists="replace")``
    parity). Returns rows written.

    SQLite is a single-file, single-writer store, so this is inherently
    a driver-side sink — it streams partitions through
    ``toLocalIterator`` (never materializes the whole DataFrame on the
    driver) and inserts in batches. Use it for curated/aggregated
    outputs like the reference does; the 100 TB path is
    ``df.write.jdbc`` against a real warehouse or :func:`write_parquet`.
    """
    if if_exists not in ("replace", "append", "fail"):
        raise ValueError(f"if_exists must be replace|append|fail, got {if_exists!r}")
    cols = df.columns
    qcols = ", ".join(f'"{c}"' for c in cols)
    placeholders = ", ".join("?" for _ in cols)
    conn = sqlite3.connect(db_path)
    try:
        cur = conn.cursor()
        exists = cur.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", (table,)
        ).fetchone()
        if exists and if_exists == "fail":
            raise ValueError(f"table {table!r} already exists")
        if if_exists == "replace":
            cur.execute(f'DROP TABLE IF EXISTS "{table}"')
            exists = None
        if not exists:
            col_defs = ", ".join(f'"{c}"' for c in cols)
            cur.execute(f'CREATE TABLE "{table}" ({col_defs})')
        n = 0
        batch: list[tuple] = []
        insert = f'INSERT INTO "{table}" ({qcols}) VALUES ({placeholders})'
        for row in df.toLocalIterator():
            batch.append(tuple(row))
            if len(batch) >= batch_size:
                cur.executemany(insert, batch)
                n += len(batch)
                batch = []
        if batch:
            cur.executemany(insert, batch)
            n += len(batch)
        conn.commit()
        return n
    finally:
        conn.close()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    num_partitions: int | None = None,
    batch_size: int = 10_000,
    options: "dict[str, str] | None" = None,
) -> None:
    """Warehouse sink — the 100 TB path :func:`write_sqlite` points to.

    Partition-parallel JDBC: every executor partition opens its own
    connection and streams ``batch_size``-row inserts, so write
    throughput scales with partitions. ``num_partitions`` caps the
    fan-in to respect the warehouse's connection budget (Spark's
    ``numPartitions`` JDBC option coalesces before writing — no extra
    shuffle). Typical call::

        write_jdbc(df, "jdbc:postgresql://wh:5432/analytics", "listings",
                   num_partitions=64,
                   options={"user": "etl", "password": "...",
                            "isolationLevel": "NONE"})

    Requires the target's JDBC driver jar on the executor classpath
    (``spark.jars`` / ``--packages``); this container ships none, so
    the unit test covers the option plumbing and the missing-driver
    error path.
    """
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    if num_partitions is not None:
        writer = writer.option("numPartitions", str(num_partitions))
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


def upsert_partitions(
    df: DataFrame, path: str, partition_by: Sequence[str]
) -> None:
    """Partition-grain upsert without a table format: overwrite ONLY
    the partitions present in ``df``, leave every other partition of
    the existing dataset untouched (Spark's
    ``partitionOverwriteMode=dynamic``).

    This is the idempotent incremental-load pattern for parquet lakes
    with no Delta/Iceberg layer: a daily re-run replaces exactly its
    own date partitions, so late-arriving corrections reprocess one
    partition instead of rewriting the dataset, and a crashed job can
    simply re-run. The dynamic mode rides as a per-write
    DataFrameWriter option (thread-safe — never a session-conf
    toggle); static overwrite (wipe the whole path) remains the
    default for full rebuilds via :func:`write_parquet`.
    """
    # per-WRITE option, not the session conf: a session-global toggle
    # races any concurrent write on the same SparkSession (another
    # thread's overwrite between our set and restore would turn
    # static and wipe untouched partitions — the exact failure this
    # function exists to prevent). The DataFrameWriter option scopes
    # the mode to this write alone.
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    *,
    target_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet write: multi-column data skipping
    without a table format.

    Partitioning prunes on ONE coarse column; clustering makes the
    parquet row-group/file MIN-MAX stats tight on SEVERAL columns at
    once, so a reader filtering on any of them skips most files. Each
    clustering column is linearly scaled to ``min(16, 63 // n)`` bits
    against its global min/max (one tiny aggregate, folded in as
    literals — the per-column width shrinks as columns are added so
    every interleaved bit position stays inside the 63 non-sign bits
    of the long; Spark's shiftleft masks shift counts mod 64, so an
    unguarded 16-bit × 5-column interleave would silently wrap the
    high bits of later columns onto the LOW z positions and destroy
    the ordering). The bit patterns are Morton-interleaved into a
    single z-value — built entirely from Catalyst shift/mask
    expressions, no UDF — and the frame is range-partitioned + sorted
    on it, giving every output file a compact hyper-rectangle of the
    value space.

    Accepted column types: numeric, date (days scale), timestamp
    (microseconds scale). Anything else (strings…) has no meaningful
    linear order for min/max skipping — rejected with a ValueError
    rather than silently producing a useless layout. Linear scaling is
    the simple-and-honest variant (heavy skew compresses into few
    codes; the fix at scale is rank-based scaling via approxQuantile
    cut points — same interleave downstream). NULLs scale to 0,
    degenerate (min == max) columns contribute a constant.
    Best-effort layout only: results are identical under any layout,
    readers need no special handling.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = list(cluster_cols)
    if not cols:
        raise ValueError("write_clustered: need at least one cluster column")
    n = len(cols)
    bits = min(16, 63 // n)
    if bits < 4:
        raise ValueError(
            f"write_clustered: {n} cluster columns leave only {bits} bits "
            "per column — too coarse to order on; cluster on fewer columns"
        )
    nums = {}
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, T.DateType):
            nums[c] = F.unix_date(F.col(c)).cast("double")
        elif isinstance(dt, T.TimestampType):
            nums[c] = F.unix_micros(F.col(c)).cast("double")
        elif isinstance(dt, T.NumericType):
            nums[c] = F.col(c).cast("double")
        else:
            raise ValueError(
                f"write_clustered: column {c!r} has type "
                f"{dt.simpleString()} — only numeric/date/timestamp "
                "columns have a linear order min/max skipping can use"
            )
    bounds = df.agg(
        *[F.min(nums[c]).alias(f"mn_{c}") for c in cols],
        *[F.max(nums[c]).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    scaled = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None or mx == mn:
            scaled.append(F.lit(0).cast("long"))
            continue
        span = float(mx) - float(mn)
        s = (
            (F.coalesce(nums[c], F.lit(float(mn))) - float(mn))
            / span
            * ((1 << bits) - 1)
        )
        scaled.append(F.round(s, 0).cast("long"))
    z = F.lit(0).cast("long")
    for i, s in enumerate(scaled):
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    zdf = df.withColumn("__z", z)
    parts = target_files or df.rdd.getNumPartitions()
    (
        zdf.repartitionByRange(parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    schema: str | None = None,
) -> int:
    """Small-file compaction for a parquet directory — the lake
    maintenance job every streaming/incremental sink eventually needs
    (each microbatch/task leaves a file; a million 100 KB files make
    listing and footer reads the bottleneck long before data volume
    does). Rewrites the dataset into ``ceil(total_bytes /
    target_file_bytes)`` files and returns the new file count.

    Mechanics: read (with the caller's stated ``schema`` if given —
    same rationale as the JSONL reader: inference over a corrupt or
    evolving lake is the risk), repartition to the target count,
    write to a ``_compacting`` sibling, then swap via the Hadoop
    FileSystem API (works on any supported URI, same contract as the
    streaming epoch ledger). The swap is delete-then-rename — NOT
    atomic on object stores: run it from the single maintenance
    owner of the path (concurrent readers on HDFS see the old listing
    until the rename; on S3-style stores schedule it in the
    ingestion pause, exactly like Delta/Iceberg's OPTIMIZE asks).
    Row-content equality is the test's contract; ordering is not.
    Partitioned lakes: this rewrites the tree UNPARTITIONED — compact
    a partitioned dataset per partition directory (point ``path`` at
    the partition), or recombine with :func:`upsert_partitions`.
    """
    import math

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    src_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = src_path.getFileSystem(hconf)
    tmp = path.rstrip("/") + "_compacting"
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    aside = path.rstrip("/") + "_pre_compact"
    aside_path = jvm.org.apache.hadoop.fs.Path(aside)
    # crash recovery FIRST: the swap below never deletes the only
    # copy, so the invariant is "at least one complete copy exists at
    # src, tmp, or aside". If a prior run died mid-swap, put it back.
    if not fs.exists(src_path):
        if fs.exists(tmp_path):
            # died between rename(src→aside) and rename(tmp→src); the
            # tmp copy was fully written before any rename started
            fs.rename(tmp_path, src_path)
        elif fs.exists(aside_path):
            fs.rename(aside_path, src_path)
        else:
            raise IOError(f"compact_parquet: {path} does not exist")
    total = fs.getContentSummary(src_path).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    # overwrite mode replaces any stale/partial tmp from a prior crash
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # swap sequence that keeps a complete copy reachable at every
    # step: park the old tree aside, move the new one in, THEN drop
    # the old. (The previous delete-then-rename left a window where
    # the only copy sat at the tmp path — and a later run treated
    # that tmp as garbage.)
    if fs.exists(aside_path):  # superseded old data from a prior run
        fs.delete(aside_path, True)
    if not fs.rename(src_path, aside_path):
        raise IOError(f"compact_parquet: could not park {path} aside")
    if not fs.rename(tmp_path, src_path):
        # put the original back; nothing lost
        fs.rename(aside_path, src_path)
        raise IOError(
            f"compact_parquet: rename {tmp} -> {path} failed; "
            "original restored"
        )
    fs.delete(aside_path, True)
    return n_files


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    batch_ts: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
    open_end: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 merge: fold one update batch
    into a versioned dimension snapshot, returning the NEW snapshot —
    the warehouse-load pattern the reference's append-only SQLite load
    (main.py's to_sql) silently loses history to. Rows whose tracked
    attributes changed get their current version CLOSED
    (valid_to = batch_ts, is_current = false) and a fresh open version
    appended; unchanged rows pass through untouched; brand-new keys
    open their first version at ``batch_ts``.

    Pure-DataFrame (engine-agnostic output): the function computes the
    snapshot rather than mutating storage, so the caller picks the
    sink — overwrite a parquet dimension dir, MERGE INTO a warehouse
    table via JDBC, or feed a downstream join directly.

    Scale shape: ONE equi-join of the current OPEN slice against the
    update batch on the business key (historical/closed versions never
    join — they union back unchanged after a cheap is_current filter),
    change detection is a null-safe equality on the tracked columns
    (eqNullSafe — NULL→value and value→NULL are real changes), and the
    output is three union branches (history + closed/carried current +
    new versions) with identical schemas. No window, no global sort;
    the join broadcasts whenever the batch is small (AQE/threshold),
    which is the common nightly-load case.

    Contract: ``updates`` carries exactly (key_cols + tracked_cols) —
    one row per key (dedupe upstream: batches with several versions of
    one key need one scd2_apply per micro-batch or a pre-collapse);
    ``current`` is a prior scd2 snapshot or an empty frame with the
    snapshot schema.
    """
    from pyspark.sql import functions as F

    keys = list(key_cols)
    tracked = list(tracked_cols)
    ts = F.lit(batch_ts).cast("timestamp")
    open_lit = F.lit(open_end).cast("timestamp")

    history = current.filter(~F.col(is_current))
    open_now = current.filter(F.col(is_current))

    upd = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in keys + tracked]
    )
    key_cond = None
    for c in keys:
        e = F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        key_cond = e if key_cond is None else (key_cond & e)
    joined = open_now.join(upd, key_cond, "full_outer")

    same = None
    for c in tracked:
        e = F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        same = e if same is None else (same & e)

    in_current = F.col(is_current).isNotNull()
    in_batch = F.col(f"__u_{keys[0]}").isNotNull() if keys else F.lit(False)

    # branch 1: open rows — carried (unchanged or absent from batch),
    # or closed at batch_ts (tracked attrs changed)
    carried = joined.filter(in_current).select(
        *keys,
        *tracked,
        F.col(valid_from),
        F.when(in_batch & ~same, ts).otherwise(F.col(valid_to)).alias(valid_to),
        F.when(in_batch & ~same, F.lit(False))
        .otherwise(F.lit(True))
        .alias(is_current),
    )
    # branch 2: fresh versions — changed keys and brand-new keys
    fresh = joined.filter(
        in_batch & (~in_current | ~same)
    ).select(
        *[F.col(f"__u_{c}").alias(c) for c in keys],
        *[F.col(f"__u_{c}").alias(c) for c in tracked],
        ts.alias(valid_from),
        open_lit.alias(valid_to),
        F.lit(True).alias(is_current),
    )
    cols = keys + tracked + [valid_from, valid_to, is_current]
    return (
        history.select(*cols)
        .unionByName(carried.select(*cols))
        .unionByName(fresh.select(*cols))
    )


def scd2_init(
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    batch_ts: str,
    *,
    open_end: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """First snapshot for :func:`scd2_apply`: every row opens its
    initial version at ``batch_ts``. Pure projection — no shuffle."""
    from pyspark.sql import functions as F

    return updates.select(
        *key_cols,
        *tracked_cols,
        F.lit(batch_ts).cast("timestamp").alias("valid_from"),
        F.lit(open_end).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_asof_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Temporal (point-in-time) join of a fact stream against an SCD2
    dimension: each fact row picks up the dimension version that was
    CURRENT at the fact's own timestamp (``valid_from <= ts <
    valid_to``) — the consumer side of :func:`scd2_apply`, and the
    join that makes keeping history worthwhile (training-data
    point-in-time correctness: features must reflect what was known
    AT event time, not today's values — the leakage rule every
    feature-store join has to obey).

    Scale shape: an equi-join on the business key with the validity
    range as a residual join condition — NOT a generic interval/theta
    join, because version intervals of ONE key never overlap (the
    scd2 invariant), so the per-key match is unique and the equi-join
    keyed on the business key is the whole story: hash/sort-merge on
    the key, range predicate evaluated on the joined row. Dimensions
    are usually ≪ facts, so the dim side broadcasts under the
    threshold/AQE like any other dim. No window, no explode, no
    bucketized range trick needed (contrast operators/temporal's
    range_join, where intervals DO overlap).

    ``how='left'`` keeps facts whose timestamp precedes the first
    version (NULL dim columns) — the honest default for late
    backfills; 'inner' drops them.
    """
    from pyspark.sql import functions as F

    keys = list(key_cols)
    cond = None
    for c in keys:
        e = facts[c].eqNullSafe(dim[c])
        cond = e if cond is None else (cond & e)
    cond = (
        cond
        & (facts[ts_col] >= dim[valid_from])
        & (facts[ts_col] < dim[valid_to])
    )
    joined = facts.join(dim, cond, how)
    # drop the dim's duplicate key columns (facts' survive)
    out = joined
    for c in keys:
        out = out.drop(dim[c])
    return out
