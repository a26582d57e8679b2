"""ORC source/sink and raw-text corpus reader.

ORC is the second columnar format Spark supports natively (predicate
pushdown, column pruning, and partition pruning all work exactly as
for parquet — same DataSource v1/v2 scan machinery), and it is what a
Hive-era warehouse hands you. The wrappers are deliberately thin; the
value is the documented contracts and the tests that pin pushdown
behavior so a regression in scan shape is caught.

The raw-text reader covers the other common corpus layout: plain
``.txt`` files (one document per file). It derives DETERMINISTIC
document ids (xxhash64 of the file path / path+line-number) so
downstream dedup/curation keys are stable across re-reads and
repartitioning — ``monotonically_increasing_id`` would silently
reassign ids on every run.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink, parquet-equivalent semantics: ``partition_by`` gives
    readers partition pruning; writes stay fully parallel (one file
    per task per partition value). Compression follows
    ``spark.sql.orc.compression.codec`` (zstd/snappy)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Filters and projections push down exactly as for
    parquet (`PushedFilters` / `ReadSchema` in the explain output —
    pinned by tests/test_sources.py); partition-directory predicates
    prune at listing time."""
    return spark.read.orc(path)


def read_text_documents(
    spark: SparkSession,
    path: str,
    per_line: bool = False,
) -> DataFrame:
    """Raw ``.txt`` corpus → the documents-table shape
    (doc_id, text, source).

    One document per FILE (``wholetext``): the natural layout for
    scraped/article corpora. ``per_line=True`` instead emits one
    document per line WITH a deterministic 0-based ``line_no`` —
    derived by splitting the whole file, which is the only way to get
    stable line numbers from Spark's text source (the line-mode
    reader has no order guarantee once partitions split a file).

    doc_id is ``xxhash64(file_path)`` (per-file mode) or
    ``xxhash64(file_path, line_no)`` (per-line) — deterministic
    across re-reads, repartitioning, and cluster size, unlike
    ``monotonically_increasing_id``.

    Scale note: ``wholetext`` materializes each file in one task —
    right for corpora of many modest files (the common case). For
    multi-GB single files, pre-shard upstream or land the corpus as
    JSONL with explicit ids (sources/jsonl_source.py).
    """
    # NB: the wholetext KWARG, not .option("wholetext", ...) — the
    # PySpark reader only honors the keyword form for the text source
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("source"),
        F.col("value"),
    )
    if not per_line:
        return raw.select(
            F.xxhash64("source").alias("doc_id"),
            F.col("value").alias("text"),
            "source",
        )
    lines = raw.select(
        "source",
        # \r\n|\r|\n matches Hadoop's LineRecordReader exactly (the
        # reader behind spark.read.text terminates lines on CRLF, lone
        # CR, or LF) — a bare-\n split leaves an invisible trailing \r
        # on CRLF corpora and swallows classic-Mac lone-\r breaks
        # entirely, silently desyncing exact-dedup hashes and token
        # stats from the native reader
        F.posexplode(F.split(F.col("value"), "\\r\\n|\\r|\\n")).alias(
            "line_no", "text"
        ),
    )
    return lines.select(
        F.xxhash64("source", "line_no").alias("doc_id"),
        "text",
        "source",
        F.col("line_no").cast("long").alias("line_no"),
    )
