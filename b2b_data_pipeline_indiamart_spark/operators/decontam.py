"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard contamination check for LLM training corpora (n-gram
overlap a la GPT-3/PaLM data cards): a training document is
contaminated if any of its word n-grams (n=8 by default) also appears
in the benchmark/eval corpus. The reference pipeline has no eval-set
concept — this is one of the brief's first-class training-data
operators — but the text normalization is the shared
``dedup.normalize_doc`` (reference parity: etl.py clean_text).

Scale shape (100 TB corpus, small benchmark):

- The benchmark n-gram set is DISTINCT-collapsed and **broadcast**:
  eval suites are MBs, not TBs, so the contamination probe is a
  map-side semi-join — the training corpus never shuffles on the
  n-gram key. If the benchmark outgrows broadcast range, drop the
  hint and the same plan degrades gracefully to a shuffled semi-join
  (or pre-filter with a Bloom filter built from the benchmark grams).
- Training-side n-grams are md5 fingerprints (engine-portable;
  a production variant would fold to 64-bit ints via xxhash64 to
  halve shuffle width) deduplicated per document BEFORE the join, so
  repeated n-grams inside one doc cost one probe.
- Output is one row per training doc (shared distinct-gram count +
  flag) — aggregation happens on doc_id, the natural partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round_half_up
from .dedup import normalize_doc


def ngram_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    prepared: bool = False,
) -> DataFrame:
    """(id, gram) pairs: md5 of each space-joined word ``n``-gram of
    the normalized text, DISTINCT per document. Docs shorter than
    ``n`` tokens contribute no rows (nothing to match on).
    ``prepared=True``: ``docs`` already carries ``__toks`` (the shared
    tokenized projection of a multi-stage pipeline) — skip retokenizing."""
    if prepared:
        d = docs.select(F.col(id_col), F.col("__toks")).filter(
            F.size("__toks") >= n
        )
    else:
        toks = F.filter(
            F.split(normalize_doc(F.col(text_col)), r"\s+"), lambda t: t != ""
        )
        d = docs.select(F.col(id_col), toks.alias("__toks")).filter(
            F.size("__toks") >= n
        )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
        lambda i: F.md5(F.array_join(F.slice(F.col("__toks"), i, n), " ")),
    )
    return d.select(F.col(id_col), F.explode(grams).alias("gram")).distinct()


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    prepared: bool = False,
) -> DataFrame:
    """Per training doc: (id, shared_ngrams, contaminated).

    ``shared_ngrams`` counts DISTINCT n-grams the doc shares with the
    benchmark corpus; ``contaminated`` is true when that count is
    positive. Every training doc appears in the output (zero-overlap
    docs included) so the result can drive a filter or a report.
    ``prepared``: see :func:`ngram_fingerprints` (applies to BOTH
    sides).
    """
    bench_grams = F.broadcast(
        ngram_fingerprints(benchmark, text_col, id_col, n, prepared)
        .select("gram")
        .distinct()
    )
    train_grams = ngram_fingerprints(train, text_col, id_col, n, prepared)
    shared = (
        train_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    return train.select(F.col(id_col)).join(shared, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__shared"), F.lit(0)).cast("long").alias("shared_ngrams"),
        (F.coalesce(F.col("__shared"), F.lit(0)) > 0).alias("contaminated"),
    )


def ngram_novelty(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram NOVELTY: the share of the doc's distinct
    word n-grams that occur in NO other document — the self-information
    signal dedup pipelines use to find template/boilerplate families
    (low novelty = the doc is mostly phrases the corpus repeats) and
    data buyers use to price a source's marginal contribution.

    Scale shape: the distinct (doc, gram) table of
    :func:`ngram_fingerprints` (grams are md5 fingerprints — 8-byte
    shuffle keys, text never ships twice), one groupBy(gram) document-
    frequency count with map-side combine over the repeated head, a
    gram-keyed join back, and the per-doc rollup. Same three-shuffle
    silhouette as TF-IDF; the gram table is never broadcast or
    collected.

    Output: (id, n_grams, novelty 4dp) for docs with ≥ n tokens.
    """
    grams = ngram_fingerprints(docs, text_col, id_col, n)
    df_cnt = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    return (
        grams.join(df_cnt, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            round_half_up(
                F.avg(F.when(F.col("__df") == 1, 1.0).otherwise(0.0)), 4
            ).alias("novelty"),
        )
    )
