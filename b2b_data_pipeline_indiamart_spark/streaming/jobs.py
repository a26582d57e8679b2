"""Structured Streaming jobs over the events stream.

Reference parity: the scraper (scraper.py:581-621) is an incremental,
checkpointed producer — it appends finished batches to a partial CSV
and records progress in a JSON checkpoint so a crash resumes without
re-scraping. The Spark-native equivalent is a file-source stream with a
``checkpointLocation``: Structured Streaming's write-ahead offset log
plus idempotent sink commit gives exactly-once file→parquet ingestion,
strictly stronger than the reference's at-least-once manifest.

Everything here is expressed with built-in streaming operators
(``window``, ``session_window``, watermarks) so state lives in the
JVM's state store; only :func:`running_user_totals` drops to
``applyInPandasWithState`` — deliberately, as the template for custom
stateful operators the built-ins can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.rounding import round_half_up
from ..operators.dedup import LSH_MAX_BUCKET_DEFAULT


def event_stream_schema() -> T.StructType:
    """Schema of the events stream (mirrors testdata ``events``:
    ts/user_id/event_type/value/props). File streams require an
    explicit schema — inference would re-list the directory."""
    return T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_event_stream(
    spark: SparkSession,
    input_dir: str,
    *,
    fmt: str = "json",
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream. ``maxFilesPerTrigger`` bounds per-batch work
    so one giant backlog directory can't produce an unbounded batch."""
    reader = spark.readStream.format(fmt).schema(schema or event_stream_schema())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(input_dir)


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "15 minutes",
) -> DataFrame:
    """Tumbling (or sliding) windowed counts + value sum per event_type.

    The watermark bounds state: windows older than
    ``max(event time) - watermark`` are finalized and evicted, so state
    size is O(active windows × event types) regardless of stream
    length — the property that lets this run forever at scale.
    """
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_session_aggregate(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Gap-based sessionization with the native ``session_window``.

    Same semantics as the batch ``events_sessionize`` operator (gap >
    ``gap`` starts a new session) but incremental: the state store
    merges adjacent session windows per user and the watermark closes
    sessions whose end precedes it. No Python in the loop.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


_TOTALS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_TOTALS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user event count + value total via
    ``applyInPandasWithState`` — the custom-stateful-operator template.

    State is one (count, sum) pair per user, updated from Arrow batches
    and re-emitted each micro-batch (update mode). Use this shape for
    operators the built-ins can't express; for anything expressible as
    a windowed/session aggregate prefer those — JVM state store, no
    Python round-trip.
    """

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_TOTALS_OUT,
            stateStructType=_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_SESS_STATE = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_SESS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)


def stateful_sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark: str = "15 minutes",
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``
    with EVENT-TIME TIMEOUT — the full custom-operator template the
    built-in ``session_window`` can't generalize from (arbitrary
    per-session state, arbitrary close-time logic, emit-on-close).

    Per user the state is one open session (start, last, count, sum).
    A batch's events merge in event-time order: a gap > ``gap_minutes``
    closes the current session (emitted immediately) and opens a new
    one. The timeout timestamp is re-armed to ``last + gap`` after
    every batch, so when the WATERMARK passes it — i.e. no event can
    ever extend the session again — Spark calls the function with
    ``hasTimedOut`` and the final session is emitted and its state
    dropped. State is O(active users), bounded by the watermark;
    emission is append-mode (each session exactly once).
    """
    gap_ms = gap_minutes * 60 * 1000

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        def emit(sessions):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(sessions),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _, _ in sessions],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _, _ in sessions],
                    "n_events": [n for _, _, n, _ in sessions],
                    "session_value": [round(v, 4) for _, _, _, v in sessions],
                }
            )

        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield emit([(start, last, n, total)])
            return

        parts = [pdf[["ts", "value"]] for pdf in pdf_iter]
        batch = pd.concat(parts).sort_values("ts")
        ts_ms = (batch["ts"].astype("int64") // 1_000_000).tolist()
        values = batch["value"].fillna(0.0).tolist()

        cur = state.get if state.exists else None
        closed = []
        for t, v in zip(ts_ms, values):
            if cur is None:
                cur = (t, t, 1, float(v))
            elif t - cur[1] > gap_ms:
                closed.append(cur)
                cur = (t, t, 1, float(v))
            else:
                cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + float(v))
        state.update(cur)
        state.setTimeoutTimestamp(cur[1] + gap_ms)
        yield emit(closed)

    return (
        events.select("ts", "user_id", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SESS_OUT,
            stateStructType=_SESS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def view_click_attribution(
    events: DataFrame,
    *,
    within: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream join: each click attributed to the same user's
    preceding view within ``within``.

    Both sides are the one input stream filtered by type (the scan is
    shared). The time-bound condition + watermarks let Spark bound both
    join-state buffers — views older than the bound are evicted, so
    state is O(traffic × within), not O(stream). The canonical
    attribution-join shape for clickstream pipelines.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {within}"))
    )
    return views.join(clicks, cond, "inner").select(
        F.col("v_user").alias("user_id"), "view_ts", "click_ts", "click_value"
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    *,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and evicts
    key state once the watermark passes it — bounded state, unlike a
    plain streaming ``dropDuplicates`` whose key set grows forever.
    This is the streaming face of the batch ``dedup_exact_docs``
    operator: at-most-once emission per key per watermark window, the
    shape an ingest pipeline needs to suppress re-sent documents.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["user_id", "event_type"]
    )


def start_memory_sink(
    sdf: DataFrame, name: str, *, output_mode: str = "update"
) -> StreamingQuery:
    """Test/debug sink: results land in an in-memory table ``name``."""
    return (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def start_parquet_ingest(
    sdf: DataFrame, output_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Checkpointed file→parquet ingestion (exactly-once). Restarting
    with the same ``checkpoint_dir`` resumes from the recorded offsets —
    the scraper's checkpoint/partial-CSV resume, Spark-native."""
    return (
        sdf.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def streaming_decontaminate(
    doc_stream: DataFrame,
    benchmark_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """Streaming face of the batch decontamination operator: each
    arriving document is flagged if it shares any word n-gram with the
    STATIC benchmark corpus — the stream-static join pattern (a live
    ingest feed probed against a fixed reference table).

    Streaming-safe shape: the batch operator's explode → distinct →
    groupBy would need a watermark and delayed emission; instead the
    benchmark side collapses to ONE static row holding the distinct
    gram set (``collect_set`` — eval suites are small, same broadcast
    argument as decontam.decontaminate), the stream side keeps each
    doc's grams as an ``array_distinct`` column, and the flag is
    ``array_intersect`` size — a map-only stream-static broadcast
    join, append-mode clean with no state and no watermark. Per-row
    cost is |doc grams| × lookup against a set shipped once per task.
    """
    from ..operators.decontam import ngram_fingerprints
    from ..operators.dedup import normalize_doc

    bench = F.broadcast(
        ngram_fingerprints(benchmark_docs, text_col, id_col, n)
        .agg(F.collect_set("gram").alias("__bench_grams"))
    )
    toks = F.filter(
        F.split(normalize_doc(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
                lambda i: F.md5(F.array_join(F.slice(toks, i, n), " ")),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    shared = F.size(F.array_intersect(F.col("__g"), F.col("__bench_grams")))
    return (
        doc_stream.withColumn("__g", grams)
        .join(bench)
        .select(
            F.col(id_col),
            shared.cast("long").alias("shared_ngrams"),
            (shared > 0).alias("contaminated"),
        )
    )


def streaming_cms_cells(
    event_stream: DataFrame, key_col: str = "user_id", depth: int = 4, width: int = 1024
) -> DataFrame:
    """Streaming face of the count-min sketch: the same per-event
    (row, bucket) expansion as operators/sketches.cms_cells, but the
    counter table is maintained as a STREAMING aggregation — state is
    bounded at depth × width rows forever, which is the whole point of
    sketching a stream: heavy-hitter frequency over an unbounded key
    space with O(1) memory and no watermark/eviction policy needed
    (counters only grow; emit in update mode).

    Both faces share the SAME code path — this delegates to
    sketches.cms_cells (the transformation is streaming-agnostic, so
    Spark plans it as a streaming aggregation when the input is a
    stream), which is what makes the pinned stream-cells == batch-
    cells twin contract unbreakable: there is one hash expression to
    change, not two copies to keep in sync.
    """
    from ..operators.sketches import cms_cells

    return cms_cells(event_stream, key_col, depth=depth, width=width)


def start_idempotent_batch_sink(
    sdf: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    ledger_dir: str,
) -> StreamingQuery:
    """foreachBatch sink with an epoch ledger — exactly-once delivery
    to a sink that is only atomic per-directory (object stores, JDBC
    staging tables, external APIs).

    Spark's foreachBatch contract is AT-LEAST-once: after a crash
    between "user function ran" and "offsets committed", the SAME
    epoch_id is replayed with the same data. The standard production
    defense is an idempotent writer keyed on epoch_id: each epoch
    writes to ``output_dir/epoch=<id>`` and then records the id in a
    ledger; a replayed epoch whose ledger entry exists is skipped, and
    a half-written directory without a ledger entry is overwritten by
    the retry. Readers see exactly-once output; the partition layout
    also gives them epoch-grain pruning.

    Scale notes: the ledger touch is one tiny driver-side marker per
    epoch (metadata-scale, like the streaming offset log itself);
    the epoch write is a normal distributed parquet job. The marker
    check/create goes through the Hadoop FileSystem API, so the
    ledger works on ANY URI Spark can write to (``s3a://``,
    ``abfs://``, ``hdfs://``, ``file:``) — a plain ``os.path`` check
    would silently never see markers on an object store and every
    replayed epoch would rewrite. The same shape serves JDBC (staging
    table + transactional rename) or an API (epoch-id dedup key).
    """

    def _fs_and_path(spark, path_str: str):
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(path_str)
        return path.getFileSystem(hconf), path

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, marker = _fs_and_path(spark, f"{ledger_dir}/epoch-{epoch_id}")
        if fs.exists(marker):  # replay of a committed epoch
            return
        (
            batch_df.write.mode("overwrite")  # retry overwrites partials
            .parquet(f"{output_dir}/epoch={epoch_id}")
        )
        # commit AFTER the data lands; createNewFile is atomic on HDFS
        # and a single conditional PUT on object stores
        fs.mkdirs(marker.getParent())
        fs.createNewFile(marker)

    return (
        sdf.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def neardup_state_schemas(id_field, k: int):
    """Explicit schemas for the two near-dup state stores (sigs and
    bands), INCLUDING the partition columns. Reading with an explicit
    schema (instead of inference) makes a replay robust to the
    crash-after-mkdir case: a state directory that exists but holds no
    committed parquet yet reads as an empty frame instead of failing
    schema inference and wedging the stream until manual cleanup.
    """
    from pyspark.sql import types as T

    sig_schema = T.StructType(
        [id_field]
        + [T.StructField(f"mh_{i}", T.LongType()) for i in range(k)]
        + [T.StructField("epoch", T.LongType())]
    )
    band_schema = T.StructType([
        id_field,
        T.StructField("band_id", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
        T.StructField("epoch", T.LongType()),
        T.StructField("band_bucket", T.IntegerType()),
    ])
    return sig_schema, band_schema


def read_neardup_band_store(
    spark,
    state_dir: str,
    id_field,
    *,
    k: int = 64,
    exclude_epoch: int | None = None,
    buckets: "list[int] | None" = None,
) -> DataFrame:
    """Band-index half of the near-dup state store, pruned to the
    probe's band buckets.

    The store is laid out ``state_dir/bands/epoch=<e>/band_bucket=<b>``
    so BOTH predicates here are partition filters: the in-flight-epoch
    exclusion and — the 100 TB seam — the probe's band-bucket set. A
    micro-batch touches only the buckets its own bands hash into, so
    the state scan is ∝ matching buckets, not ∝ corpus; the e2e test
    asserts the ``PartitionFilters`` entry is visible in the physical
    plan. Explicit schema per :func:`neardup_state_schemas`.
    """
    _, band_schema = neardup_state_schemas(id_field, k)
    df = spark.read.schema(band_schema).parquet(f"{state_dir}/bands")
    if exclude_epoch is not None:
        df = df.filter(F.col("epoch") != exclude_epoch)
    if buckets is not None:
        df = df.filter(F.col("band_bucket").isin(buckets))
    return df.drop("band_bucket", "epoch")


def read_neardup_sig_store(
    spark,
    state_dir: str,
    id_field,
    *,
    k: int = 64,
    exclude_epoch: int | None = None,
) -> DataFrame:
    """Signature half of the near-dup state store (one row of k minima
    per admitted doc), epoch-partitioned, explicit schema."""
    sig_schema, _ = neardup_state_schemas(id_field, k)
    df = spark.read.schema(sig_schema).parquet(f"{state_dir}/sigs")
    if exclude_epoch is not None:
        df = df.filter(F.col("epoch") != exclude_epoch)
    return df.drop("epoch")


def _assert_no_legacy_neardup_store(spark, state_dir: str) -> None:
    """Fail fast when ``state_dir`` holds the pre-r11 flat layout
    (``state_dir/epoch=N`` signature dirs at top level) instead of the
    band-bucketed ``state_dir/{sigs,bands}/epoch=N`` layout — see
    :func:`start_neardup_suppress_sink`. Silent acceptance would drop
    all previously-admitted state from cross-batch suppression."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return
    legacy = [
        st.getPath().getName()
        for st in fs.listStatus(root)
        if st.getPath().getName().startswith("epoch=")
    ]
    if legacy:
        raise ValueError(
            f"near-dup state store {state_dir!r} uses the legacy flat "
            f"layout ({legacy[:3]}…): migrate each epoch=N dir into "
            f"sigs/epoch=N and rebuild the band index under bands/ "
            f"(or point the stream at a fresh state_dir); refusing to "
            f"start rather than silently dropping admitted-state "
            f"suppression."
        )


def start_neardup_suppress_sink(
    docs: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    ledger_dir: str,
    *,
    threshold: float = 0.8,
    k: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_buckets: int = 64,
    max_bucket_size: int | None = LSH_MAX_BUCKET_DEFAULT,
) -> StreamingQuery:
    """Streaming NEAR-dup suppression — the ingest-side MinHash/LSH
    dedup a training-data pipeline runs continuously: every micro-batch
    is checked against the corpus admitted SO FAR, not just itself.

    Per epoch (foreachBatch):

    1. exact-duplicate collapse (:func:`~...dedup.exact_collapse`):
       copies of the same normalized text suppress to the min id up
       front — the same outcome the uncapped greedy pass would reach
       (identical signatures → est 1.0), but it keeps a boilerplate
       storm of >``max_bucket_size`` identical docs out of the LSH
       bucket cap's blast radius (ADVICE r12) and shrinks stages 2-3
       by the duplicate factor;
    2. MinHash signatures for the batch REPRESENTATIVES
       (operators/dedup — the SAME signature/banding math as the
       batch keys, so a batch backfill reconciles with what the
       stream admitted), then within-batch suppression: LSH self-join
       candidates (bucket cap explicit via ``max_bucket_size``),
       signature-agreement estimate ≥ ``threshold`` suppresses the
       HIGHER id of each pair (greedy keep-lowest-id — the
       deterministic streaming analogue of the batch keep-first);
    3. cross-batch suppression: batch bands equi-join the PERSISTENT
       admitted-signature store (parquet under ``state_dir``), the
       two-sided :func:`~...dedup.minhash_estimate` scores candidates,
       matches ≥ ``threshold`` suppress the batch doc;
    4. admitted docs append to ``output_dir/epoch=<id>`` and their
       signatures to ``state_dir/sigs/epoch=<id>`` (and their band
       index to ``state_dir/bands/epoch=<id>/band_bucket=<b>``); an
       epoch-ledger marker
       makes replays idempotent (the start_idempotent_batch_sink
       pattern — retried epochs overwrite their own directories, and
       the state read excludes the in-flight epoch so a replay can't
       suppress a doc against its own half-written signatures).

    Scale shape: state grows one signature row (k longs) plus
    ``bands`` index rows per ADMITTED doc — the minimum any
    cross-batch exact-memory dedup needs; the per-epoch probe is a
    band equi-join (shuffle ∝ batch·bands + matching state buckets),
    never all-pairs. The band index is PARTITIONED BY
    ``band_bucket = pmod(band_hash, state_buckets)`` so the probe's
    bucket set becomes a partition filter on the state scan — at
    100 TB a micro-batch reads only the buckets its own bands hash
    into instead of the whole corpus index, and the signature fetch
    that follows is a broadcast semi-join on just the candidate ids.
    An approximate-memory variant would swap the store for a
    Bloom/CMS of band hashes at the cost of false-positive
    suppression.
    """
    from ..operators import caching, dedup

    # ADVICE r11: the store layout moved from state_dir/epoch=N
    # (signatures at top level) to state_dir/{sigs,bands}/epoch=N.
    # Restarting an old-layout store against the new reader would make
    # the exists() probe on state_dir/bands miss, SILENTLY skipping
    # cross-batch suppression and re-admitting near-duplicates while
    # orphaning the old epochs. Fail fast instead: legacy stores must
    # be migrated (or a fresh state_dir used) explicitly.
    _assert_no_legacy_neardup_store(docs.sparkSession, state_dir)

    def _fs_and_path(spark, path_str: str):
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(path_str)
        return path.getFileSystem(hconf), path

    sig_cols = [f"mh_{i}" for i in range(k)]

    def suppress_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, marker = _fs_and_path(spark, f"{ledger_dir}/epoch-{epoch_id}")
        if fs.exists(marker):  # replay of a committed epoch
            return
        pos = caching.mark()
        batch = batch_df.persist()
        try:
            if not batch.take(1):
                fs.mkdirs(marker.getParent())
                fs.createNewFile(marker)
                return
            # (1b) collapse exact duplicates BEFORE signatures (ADVICE
            # r12; the ngram_jaccard_verified discipline). Without
            # this, a batch of >max_bucket_size identical/boilerplate
            # docs lands in ONE oversized bucket in EVERY band; the cap
            # would drop them all and the "other, more selective bands"
            # recovery argument does not apply to exact copies — every
            # copy would be silently admitted. Collapsing first
            # suppresses the copies exactly as the uncapped greedy pass
            # would (identical normalized text → identical signatures →
            # est_jaccard 1.0 → higher ids suppressed) and makes the
            # bucket cap safe for the near-dup stage, which now only
            # ever sees distinct normalized texts.
            members = caching.persist_tracked(
                dedup.exact_collapse(batch, text_col, id_col)
            )
            exact_sup = members.filter(
                F.col(id_col) != F.col("rep_id")
            ).select(id_col)
            reps = batch.join(
                members.filter(F.col(id_col) == F.col("rep_id"))
                .select(id_col),
                id_col,
                "left_semi",
            )
            sigs = caching.persist_tracked(
                dedup.minhash_signatures(reps, text_col, id_col, k=k)
            )
            # (2) within-batch greedy suppression (representatives
            # only; the cap is explicit at this call site — sink param)
            pairs = dedup.lsh_candidate_pairs(
                sigs, id_col=id_col, k=k, bands=bands,
                max_bucket_size=max_bucket_size,
            )
            sup = (
                dedup.minhash_estimate(pairs, sigs, id_col=id_col, k=k)
                .filter(F.col("est_jaccard") >= threshold)
                .select(F.col("id_b").alias(id_col))
                .unionByName(exact_sup)
            )
            # (3) cross-batch suppression vs the admitted store
            id_field = batch.schema[id_col]
            batch_bands = caching.persist_tracked(
                dedup.band_table(sigs, id_col=id_col, k=k, bands=bands)
                .withColumn(
                    "band_bucket",
                    F.pmod(F.col("band_hash"), F.lit(state_buckets))
                    .cast("int"),
                )
            )
            state_fs, state_path = _fs_and_path(spark, f"{state_dir}/bands")
            if state_fs.exists(state_path):
                # the probe's bucket set (≤ state_buckets ints) prunes
                # the band-index scan to matching partitions
                probe_buckets = [
                    r["band_bucket"]
                    for r in batch_bands.select("band_bucket")
                    .distinct().collect()
                ]
                state_bands = read_neardup_band_store(
                    spark, state_dir, id_field, k=k,
                    exclude_epoch=epoch_id,  # in-flight replay
                    buckets=probe_buckets,
                ).withColumnRenamed(id_col, "__state_id")
                cand = (
                    batch_bands
                    .join(state_bands, ["band_id", "band_hash"])
                    .select(
                        F.col(id_col).alias("id_a"),
                        F.col("__state_id").alias("id_b"),
                    )
                    .distinct()
                )
                cand = caching.persist_tracked(cand)
                # fetch ONLY the candidate ids' signatures: broadcast
                # semi-join of the (small) candidate set against the
                # sig store — no state-wide shuffle
                state_sigs = read_neardup_sig_store(
                    spark, state_dir, id_field, k=k,
                    exclude_epoch=epoch_id,
                ).join(
                    F.broadcast(
                        cand.select(F.col("id_b").alias(id_col)).distinct()
                    ),
                    id_col,
                    "left_semi",
                )
                sup_state = (
                    dedup.minhash_estimate(
                        cand, sigs, id_col=id_col, k=k,
                        signatures_b=state_sigs,
                    )
                    .filter(F.col("est_jaccard") >= threshold)
                    .select(F.col("id_a").alias(id_col))
                )
                sup = sup.unionByName(sup_state)
            admitted = batch.join(sup.distinct(), id_col, "left_anti")
            admitted.write.mode("overwrite").parquet(
                f"{output_dir}/epoch={epoch_id}"
            )
            # signatures of the admitted docs extend the store; read
            # back the WRITTEN output so the two writes can't diverge
            # under a lazy recomputation
            admitted_ids = spark.read.parquet(
                f"{output_dir}/epoch={epoch_id}"
            ).select(id_col)
            admitted_sigs = caching.persist_tracked(
                sigs.join(admitted_ids, id_col)
            )
            admitted_sigs.write.mode("overwrite").parquet(
                f"{state_dir}/sigs/epoch={epoch_id}"
            )
            (
                batch_bands.join(admitted_ids, id_col)
                .write.mode("overwrite")
                .partitionBy("band_bucket")
                .parquet(f"{state_dir}/bands/epoch={epoch_id}")
            )
            fs.mkdirs(marker.getParent())
            fs.createNewFile(marker)
        finally:
            caching.release_from(pos)
            batch.unpersist()

    return (
        docs.writeStream.foreachBatch(suppress_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def embedding_state_schema(id_field) -> "T.StructType":
    """Explicit schema for the embedding near-dup state store
    (``state_dir/vecs/epoch=<e>/cell=<c>``): one (id, v) row per
    ADMITTED vector plus the two directory-encoded partition columns.
    Explicit for the same reason as :func:`neardup_state_schemas` —
    an empty store directory must not wedge the stream on schema
    inference."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            id_field,
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("epoch", T.LongType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )


def read_embedding_neardup_store(
    spark,
    state_dir: str,
    id_field,
    *,
    exclude_epoch: int | None = None,
    cells: "list[int] | None" = None,
) -> DataFrame:
    """Admitted-vector state store, pruned to the probe's cells.

    Layout ``state_dir/vecs/epoch=<e>/cell=<c>`` makes BOTH predicates
    partition filters: the in-flight-epoch exclusion and — the 100 TB
    seam — the batch's cell set (the IVF probe discipline: a
    micro-batch compares only against vectors routed to its own
    cells, ∝ matching cells, never ∝ corpus)."""
    schema = embedding_state_schema(id_field)
    df = spark.read.schema(schema).parquet(f"{state_dir}/vecs")
    if exclude_epoch is not None:
        df = df.filter(F.col("epoch") != exclude_epoch)
    if cells is not None:
        df = df.filter(F.col("cell").isin(cells))
    return df.drop("epoch")


def start_embedding_neardup_suppress_sink(
    vecs: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    ledger_dir: str,
    *,
    centroids: "list[list[float]]",
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> StreamingQuery:
    """Streaming SEMANTIC near-dup suppression — the embedding half of
    the ingest-side dedup story (VERDICT r13 #7): the cosine/SemDeDup
    analogue of :func:`start_neardup_suppress_sink`, probing a
    persistent cell-bucketed vector store so every micro-batch is
    checked against the corpus admitted SO FAR.

    ``centroids`` is the trained-state-shipped-as-literals seam (the
    PQ/IVF codebook pattern): k-means cells trained OFFLINE on a
    backfill (operators/similarity.kmeans_centroids) and passed in as
    plain lists, so the streaming plan carries no training step and
    every epoch routes with the identical broadcast gemm the batch
    keys use (operators/similarity.ivf_assign).

    Per epoch (foreachBatch):

    1. nearest-centroid cell assignment (map-only Arrow gemm,
       centroid matrix task-broadcast — no shuffle);
    2. within-batch suppression: the IDENTICAL
       operators/similarity.semdedup keep rule the batch
       `semdedup_kmeans` / `semdedup_seeded_portable` keys run —
       a vector is dropped iff a LOWER-ID batch vector in its cell
       has 4dp cosine ≥ ``threshold`` (blocked-gemm pairs, exists-
       based, lowest id of every near-dup set survives);
    3. cross-batch suppression: batch survivors probe the admitted
       store pruned to the batch's OWN cells (partition filter — the
       IVF probe shape), 4dp cosine ≥ threshold against any admitted
       same-cell vector suppresses the batch vector (admitted state
       always wins: arrival order is the stream's total order, the
       same asymmetry as the MinHash sink);
    4. admitted vectors append to ``output_dir/epoch=<id>`` and the
       state store; an epoch-ledger marker makes replays idempotent
       (retried epochs overwrite their own directories; the state
       read excludes the in-flight epoch so a replay cannot suppress
       a vector against its own half-written state).

    Scale shape: state grows ONE (id, vector) row per ADMITTED vector
    — the minimum any exact-memory semantic dedup needs (the
    approximate-memory variant would store SQ8-quantized vectors at
    4× less, at the cost of quantization-boundary false verdicts);
    the per-epoch probe is batch × admitted-in-matching-cells, the
    standard IVF trade — cell count sizes the probe, and a skewed
    cell is the same hazard (and fix: more cells / split the hot
    cell) as any IVF index. Suppression math is 4dp-rounded cosine in
    BOTH the within-batch and cross-batch legs, so stream decisions
    reconcile with a batch backfill over the same corpus
    (tests pin stream ≡ batch semdedup under ordered arrival).
    """
    from ..operators import caching, similarity

    def _fs_and_path(spark, path_str: str):
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(path_str)
        return path.getFileSystem(hconf), path

    def suppress_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, marker = _fs_and_path(spark, f"{ledger_dir}/epoch-{epoch_id}")
        if fs.exists(marker):  # replay of a committed epoch
            return
        pos = caching.mark()
        batch = batch_df.persist()
        try:
            if not batch.take(1):
                fs.mkdirs(marker.getParent())
                fs.createNewFile(marker)
                return
            # (1) route to cells with the batch keys' assignment gemm
            assigned = similarity.ivf_assign(
                batch, centroids, vec_col=vec_col, id_col=id_col,
                out_id="__aid",
            )
            clustered = caching.persist_tracked(
                batch.select(
                    F.col(id_col).cast("long").alias(id_col),
                    F.col(vec_col),
                )
                .join(
                    assigned.select("__aid", "cell"),
                    F.col(id_col) == F.col("__aid"),
                )
                .select(id_col, vec_col, F.col("cell").alias("__cell"))
            )
            # (2) within-batch: the batch semdedup keep rule verbatim
            batch_sup = (
                similarity.semdedup(
                    clustered, "__cell", vec_col=vec_col, id_col=id_col,
                    threshold=threshold,
                )
                .filter(~F.col("kept"))
                .select(id_col)
            )
            survivors = caching.persist_tracked(
                clustered.join(batch_sup, id_col, "left_anti").select(
                    id_col,
                    similarity.as_double_array(F.col(vec_col)).alias("__v"),
                    "__cell",
                )
            )
            # (3) cross-batch probe, pruned to the batch's own cells
            sup = batch_sup
            id_field = clustered.schema[id_col]
            state_fs, state_path = _fs_and_path(spark, f"{state_dir}/vecs")
            if state_fs.exists(state_path):
                probe_cells = [
                    r["__cell"]
                    for r in survivors.select("__cell").distinct().collect()
                ]
                state = read_embedding_neardup_store(
                    spark, state_dir, id_field,
                    exclude_epoch=epoch_id, cells=probe_cells,
                ).select(
                    F.col("v").alias("__sv"),
                    F.col("cell").alias("__cell"),
                )
                sup_state = (
                    survivors.join(state, "__cell")
                    .filter(
                        round_half_up(
                            similarity.cosine(F.col("__v"), F.col("__sv")),
                            4,
                        )
                        >= threshold
                    )
                    .select(id_col)
                )
                sup = sup.unionByName(sup_state)
            admitted = batch.join(sup.distinct(), id_col, "left_anti")
            admitted.write.mode("overwrite").parquet(
                f"{output_dir}/epoch={epoch_id}"
            )
            # extend the state from the WRITTEN output so the two
            # writes cannot diverge under a lazy recomputation
            admitted_ids = spark.read.parquet(
                f"{output_dir}/epoch={epoch_id}"
            ).select(F.col(id_col).cast("long").alias(id_col))
            (
                survivors.join(admitted_ids, id_col)
                .select(
                    id_col,
                    F.col("__v").alias("v"),
                    F.col("__cell").alias("cell"),
                )
                .write.mode("overwrite")
                .partitionBy("cell")
                .parquet(f"{state_dir}/vecs/epoch={epoch_id}")
            )
            fs.mkdirs(marker.getParent())
            fs.createNewFile(marker)
        finally:
            caching.release_from(pos)
            batch.unpersist()

    return (
        vecs.writeStream.foreachBatch(suppress_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def streaming_quality_gate(doc_stream: DataFrame) -> DataFrame:
    """Streaming face of the model-based quality filter: the SAME
    operator function (operators/textstats.quality_logit) applied to
    the live ingest feed.

    There is deliberately no reimplementation here — quality_logit is
    a pure Catalyst projection (zero shuffle, zero state), so the
    batch operator IS streaming-safe as written: append-mode clean,
    no watermark, per-row cost identical to the batch plan. This
    wrapper exists to state that contract and to carry the pytest pin
    that streaming flags equal the batch operator's on the same rows
    (tests/test_streaming.py) — the same twin discipline as
    streaming_decontaminate, which needed an actual restatement
    (its batch shape has a groupBy) where this one does not.
    """
    from ..operators.textstats import quality_logit

    return quality_logit(doc_stream)


def running_distinct_types(events: DataFrame) -> DataFrame:
    """Per-user distinct-event-type tracker via Spark 4's
    ``transformWithStateInPandas`` — the SECOND-generation stateful
    API (SPARK-49564): a ``StatefulProcessor`` class with typed state
    handles (ValueState here; ListState/MapState and event/processing
    timers in the same API) instead of applyInPandasWithState's single
    tuple. This is the template for new custom stateful operators;
    the older API stays on the sessionizer for comparison.

    State per user is one (sorted distinct types) value; each batch
    emits (user_id, n_types, n_events). Requires the RocksDB state
    store provider and the ``protobuf`` Python package (the TWS
    driver↔worker channel is proto-serialized) — absent protobuf,
    the query fails at initialization, and the end-to-end pytest
    coverage is importorskip-gated accordingly. The processor class
    itself lives at module level so its CROSS-BATCH state handling is
    unit-tested against a fake ValueState even where protobuf is
    missing (tests/test_streaming.py) — that path is the whole point
    of a stateful operator and must not depend on env luck.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=DistinctTypesProcessor(),
        outputStructType=DistinctTypesProcessor.OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def _stateful_processor_base():
    """Resolve the StatefulProcessor base class.

    NOT lazy — this runs in ``DistinctTypesProcessor``'s base-class
    list, i.e. at import of this module (which ``streaming/__init__``
    pulls in). That is fine today: Spark 4.1's
    ``stateful_processor`` module imports without protobuf (only query
    START needs it). The helper exists to keep the dependency in ONE
    named seam: if a future Spark moves the proto import to module
    scope, this is the single line to wrap in a stub-emitting
    try/except so the batch package keeps importing."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    return StatefulProcessor


class DistinctTypesProcessor(_stateful_processor_base()):
    """transformWithStateInPandas processor for running_distinct_types.

    One ValueState per user holding the sorted distinct event types.
    ``ValueState.update`` takes ONE tuple element per schema field —
    ``(list,)`` for the single array<string> field. Double-wrapping
    ``([list],)`` pickles fine on batch 1 but corrupts state: the next
    batch's ``get()[0]`` is a list-of-lists and ``set()`` raises
    unhashable-type, killing the query on any RETURNING user.
    """

    OUT_SCHEMA = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_types", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )

    STATE_SCHEMA = T.StructType(
        [T.StructField("types", T.ArrayType(T.StringType()))]
    )

    def init(self, handle) -> None:
        self._seen = handle.getValueState("seen", self.STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        seen = set(self._seen.get()[0]) if self._seen.exists() else set()
        n = 0
        for pdf in rows:
            seen |= set(pdf["event_type"])
            n += len(pdf)
        self._seen.update((sorted(seen),))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_types": [len(seen)], "n_events": [n]}
        )

    def close(self) -> None:
        pass


def running_distinct_types_apws(events: DataFrame) -> DataFrame:
    """First-generation twin of :func:`running_distinct_types` on
    ``applyInPandasWithState`` (VERDICT r14 #6): the IDENTICAL
    per-user distinct-type tracker — state is one sorted distinct-type
    list, each batch emits (user_id, n_types, n_events) — with the
    tuple-per-schema-field state contract shared with
    ``DistinctTypesProcessor`` (the ``(sorted_list,)`` single-wrap
    both APIs require; the double-wrap corruption pin in
    tests/test_streaming.py covers both through the same reference
    semantics).

    Why it exists: the TWS channel is protobuf-serialized, so the
    second-generation template can only RUN where ``google.protobuf``
    is installed; this twin is the environment-independent production
    path — HDFS-backed state store, no extra Python deps — and the
    end-to-end streaming coverage for the operator semantics runs on
    it unconditionally. Same scale shape as every apws operator here:
    one keyed shuffle to group by user, state strictly
    O(distinct types) per user.
    """

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        seen = set(state.get[0]) if state.exists else set()
        n = 0
        for pdf in pdf_iter:
            seen |= set(pdf["event_type"])
            n += len(pdf)
        state.update((sorted(seen),))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_types": [len(seen)], "n_events": [n]}
        )

    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=DistinctTypesProcessor.OUT_SCHEMA,
            stateStructType=DistinctTypesProcessor.STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_incremental_rollup(
    events: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    *,
    watermark: str = "15 minutes",
) -> StreamingQuery:
    """Continuously-maintained hourly rollup table — the
    lambda-architecture-elimination pattern: ONE streaming job keeps a
    queryable parquet aggregate current instead of a batch job
    periodically recomputing it.

    Mechanics: watermarked hourly window aggregate in UPDATE mode (a
    late-but-within-watermark event revises its hour), each microbatch
    emitting only the CHANGED (hour, type) keys; ``foreachBatch`` then
    rewrites exactly those keys' partitions via the partition-grain
    upsert (``sources.upsert_partitions`` — dynamic
    partitionOverwriteMode). THE INVARIANT THAT MAKES THIS CORRECT:
    the partition columns (day, hour, event_type) equal the
    aggregation key, so every emitted row fully determines — and
    fully replaces — its own partition. A coarser partition (just
    day) would be WIPED down to the microbatch's changed hours,
    silently dropping the untouched ones (measured, not
    hypothetical). Crash/replay safety comes from the same property:
    a replayed microbatch rewrites the same partitions with the same
    state-store contents (idempotent) — the epoch-ledger sink's
    guarantee without a ledger, because the write unit IS the update
    unit.

    Readers see a plain partitioned parquet table
    (day=.../hour=.../event_type=...) with columns (window_start,
    n_events, sum_value) — no streaming awareness needed.
    """
    from ..sources.sinks import upsert_partitions

    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            F.date_format(F.col("w.start"), "HH").alias("hour"),
        )
    )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partitions(batch_df, output_dir, ["day", "hour", "event_type"])

    return (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_scd2_dimension_sink(
    update_stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_cols: "list[str]",
    tracked_cols: "list[str]",
    snapshot_schema: str,
) -> StreamingQuery:
    """Streaming type-2 dimension maintenance: each micro-batch of
    attribute updates folds into a versioned SCD2 snapshot via
    ``sources.sinks.scd2_apply`` — the live counterpart of the nightly
    dimension load, giving downstream joins an always-current
    ``is_current`` slice plus full history.

    foreachBatch is the right tool (not a stateful operator): the
    snapshot is a TABLE the merge both reads and rewrites, which
    stream-native operators cannot express — and foreachBatch's
    batch-DataFrame view lets the same scd2_apply code serve batch
    and streaming unchanged.

    Batch mechanics: read the prior snapshot (or start empty with the
    declared schema), collapse the micro-batch to ONE row per key
    (latest by a deterministic struct-max — scd2_apply's one-version-
    per-batch contract), stamp the version at the epoch grain
    ('epoch-<id>' as valid_from would break timestamp typing, so the
    batch timestamp is derived from the epoch id deterministically),
    apply, and swap the snapshot directory with the compact_parquet
    park-aside sequence (recover at batch start, write to ``__next``,
    rename current→``__aside``, rename next→current, delete aside) so
    a COMPLETE snapshot copy is reachable at every step — a crash
    between renames can no longer leave no snapshot and trick the
    replayed epoch into the scd2_init branch (which would silently
    drop all history). Non-atomicity on object stores is documented
    at compact_parquet. Replays of a crashed epoch re-apply the
    identical batch; scd2_apply is idempotent on identical input
    (pytest-pinned), so the snapshot converges rather than
    double-versioning.

    Scale notes: each epoch is one open-slice equi-join (broadcast
    when the batch is small — the common case) plus a full snapshot
    rewrite; at a 100 TB dimension the rewrite becomes the bottleneck
    and the swap target is a partitioned layout rewritten only for
    touched partitions (upsert_partitions) or a MERGE INTO a
    table format with row-level deletes.
    """
    from ..sources.sinks import scd2_apply, scd2_init

    def apply_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        # one row per key: latest wins, deterministically — max over a
        # struct ordered by every tracked column (no event-time column
        # in the update contract, so value-order is the tiebreak)
        latest = (
            batch_df.groupBy(*key_cols)
            .agg(
                F.max(F.struct(*tracked_cols)).alias("__v")
            )
            .select(*key_cols, "__v.*")
        )
        # version timestamp = pure function of the epoch id (strictly
        # increasing across epochs, identical on replay)
        import datetime as _dt

        batch_ts = (
            _dt.datetime(2000, 1, 1) + _dt.timedelta(minutes=epoch_id)
        ).strftime("%Y-%m-%d %H:%M:%S")
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        cur_path = jvm.org.apache.hadoop.fs.Path(snapshot_dir)
        fs = cur_path.getFileSystem(hconf)
        nxt = snapshot_dir.rstrip("/") + "__next"
        nxt_path = jvm.org.apache.hadoop.fs.Path(nxt)
        aside = snapshot_dir.rstrip("/") + "__aside"
        aside_path = jvm.org.apache.hadoop.fs.Path(aside)
        # crash recovery FIRST (compact_parquet contract): if a prior
        # epoch died mid-swap the snapshot dir may be missing while a
        # complete copy sits at __next (fully written before any
        # rename — it already INCLUDES that epoch's apply) or __aside
        # (the pre-apply snapshot). Restore it before deciding between
        # the init and apply branches, otherwise the replayed epoch
        # rebuilds the dimension from one batch and loses all history.
        if not fs.exists(cur_path):
            if fs.exists(nxt_path):
                fs.rename(nxt_path, cur_path)
            elif fs.exists(aside_path):
                fs.rename(aside_path, cur_path)
        if fs.exists(cur_path):
            current = spark.read.parquet(snapshot_dir)
            snap = scd2_apply(
                current, latest, key_cols, tracked_cols, batch_ts
            )
        else:
            snap = scd2_init(latest, key_cols, tracked_cols, batch_ts)
        # overwrite replaces any stale partial __next from a crash
        # that happened mid-write (before the copy was complete)
        snap.write.mode("overwrite").parquet(nxt)
        # park-aside swap: a complete copy is reachable at every step
        if fs.exists(aside_path):  # superseded copy from a prior run
            fs.delete(aside_path, True)
        if fs.exists(cur_path):
            if not fs.rename(cur_path, aside_path):
                raise IOError(
                    f"scd2 sink: could not park {snapshot_dir} aside"
                )
        if not fs.rename(nxt_path, cur_path):
            if fs.exists(aside_path):
                fs.rename(aside_path, cur_path)
            raise IOError(
                f"scd2 sink: rename {nxt} -> {snapshot_dir} failed; "
                "prior snapshot restored"
            )
        fs.delete(aside_path, True)

    return (
        update_stream.writeStream.foreachBatch(apply_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def psi_reference(
    df: DataFrame, value_col: str = "value", n_bins: int = 10
) -> "tuple[list[float], list[int]]":
    """Freeze a PSI reference from a batch frame: exact-percentile bin
    edges (2dp-rounded BEFORE the cut — operators/profiling.psi_drift's
    discipline) plus per-bin counts, returned as plain Python lists.

    This is the trained-state-shipped-as-literals pattern (same as the
    PQ/IVF codebooks): the reference is computed ONCE on the training
    window and embedded in the streaming plan as constants, so the
    monitor itself adds no scan of historical data to any microbatch.
    """
    from ..functions.rounding import round_half_up

    qs = [round(i / n_bins, 6) for i in range(1, n_bins)]
    # round_half_up, NOT F.round: the batch psi_drift rounds edges with
    # floor(x*100+0.5), and a percentile landing exactly on a rounding
    # boundary must freeze the SAME edge here or boundary rows shift
    # bins between the batch and streaming PSI paths
    edge_row = df.agg(
        *[
            round_half_up(F.expr(f"percentile({value_col}, {q})"), 2).alias(
                f"e{i}"
            )
            for i, q in enumerate(qs, start=1)
        ]
    ).collect()[0]
    edges = [float(edge_row[f"e{i}"]) for i in range(1, n_bins)]
    bin_expr = F.lit(1)
    for e in edges:
        bin_expr = bin_expr + F.when(F.col(value_col) > e, 1).otherwise(0)
    counts = {
        r["bin"]: r["c"]
        for r in df.select(bin_expr.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    return edges, [int(counts.get(b, 0)) for b in range(1, n_bins + 1)]


def start_drift_monitor_sink(
    events: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    *,
    ref_edges: "list[float]",
    ref_counts: "list[int]",
    value_col: str = "value",
    alarm_threshold: float = 0.25,
) -> StreamingQuery:
    """Per-microbatch Population Stability Index monitor — the
    streaming form of ``orders_price_psi`` / profiling.psi_drift: each
    epoch's ``value`` distribution is binned against the FROZEN
    reference edges (broadcast literals, map-side expression) and its
    PSI vs the reference shares is appended to a queryable parquet
    metrics table, with an alarm flag at the standard 0.25
    "significant shift" band.

    Scale shape per epoch: one conditional-sum aggregate collapses the
    batch to ≤ n_bins rows; the PSI arithmetic runs on those ≤ 10
    numbers driver-side (metadata scale — loop-control math, not data
    movement). Exactly-once without a ledger: the metrics table is
    PARTITIONED BY epoch and written via the partition-grain upsert,
    so a replayed microbatch rewrites its own epoch partition with
    identical content (the start_incremental_rollup idempotence
    argument — the write unit IS the update unit).

    Output table: epoch=N partitions with (n_rows, psi, drifted).
    """
    import math as _math

    from ..sources.sinks import upsert_partitions

    n_bins = len(ref_counts)
    if len(ref_edges) != n_bins - 1:
        raise ValueError(
            f"drift monitor: {n_bins} ref_counts needs exactly "
            f"{n_bins - 1} ref_edges, got {len(ref_edges)} — a "
            "swapped/truncated reference would silently mis-bin every "
            "microbatch"
        )
    n_ref = sum(ref_counts)
    half = 0.5 * n_bins
    ref_shares = [(c + 0.5) / (n_ref + half) for c in ref_counts]
    bin_expr = F.lit(1)
    for e in ref_edges:
        bin_expr = bin_expr + F.when(F.col(value_col) > F.lit(e), 1).otherwise(
            0
        )
    spark = events.sparkSession

    def score_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        rows = (
            batch_df.select(bin_expr.cast("int").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        if not rows:
            return
        counts = {r["bin"]: r["c"] for r in rows}
        n_cur = sum(counts.values())
        psi = 0.0
        for b in range(1, n_bins + 1):
            pc = (counts.get(b, 0) + 0.5) / (n_cur + half)
            pr = ref_shares[b - 1]
            psi += (pc - pr) * _math.log(pc / pr)
        out = spark.createDataFrame(
            [(int(epoch_id), int(n_cur), round(psi, 6),
              bool(psi > alarm_threshold))],
            "epoch LONG, n_rows LONG, psi DOUBLE, drifted BOOLEAN",
        )
        upsert_partitions(out, output_dir, ["epoch"])

    return (
        events.writeStream.foreachBatch(score_epoch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
