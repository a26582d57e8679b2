"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting.

Extends the reference's text handling (etl.py clean_text /
reports/top_product_tokens.csv tokenization) with the document-level
statistics a training-data pipeline needs. Every operator is a pure
Catalyst projection + (at most) one low-cardinality aggregation — the
per-document scoring is map-side only, so the operators scale linearly
and shuffle nothing unless the caller aggregates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round_half_up

from ..functions.hashing import md5_fingerprint
from .dedup import normalize_doc, word_tokens

#: tiny per-language stopword lists for the n-gram/stopword heuristic.
#: Deliberately small + deterministic so the same lists are usable in
#: an ANSI-SQL oracle.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "es": ("el", "la", "de", "que", "y", "en", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit"),
}
#: deterministic tie-break priority (first wins on equal score)
LANG_PRIORITY = ("en", "es", "fr", "de")


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Occurrences (with multiplicity) of any of ``words`` in toks."""
    lit_words = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_words, t)))


def _with_tokens(
    docs: DataFrame, text_col: str, id_col: str, prepared: bool = False
) -> DataFrame:
    """(id, __norm, __toks) projection shared by the scoring operators.

    Unlike the higher-order-function case (dedup._with_normalized,
    where a lambda body defeats common-subexpression elimination),
    duplicated expressions in a FLAT projection are CSE'd by
    whole-stage codegen, so this materialization is measured
    perf-neutral — it is kept for plan readability and as a guard
    against future lambda-based scoring expressions.

    ``prepared=True`` means ``docs`` ALREADY carries ``__norm`` /
    ``__toks`` (one shared, usually persisted, projection — see
    ``corpus_prep_e2e``): skip the recompute so a multi-stage pipeline
    normalizes/tokenizes the corpus once instead of once per stage."""
    if prepared:
        return docs.select(F.col(id_col), "__norm", "__toks")
    return docs.select(
        F.col(id_col),
        normalize_doc(F.col(text_col)).alias("__norm"),
        word_tokens(F.col(text_col)).alias("__toks"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language ID → (id, pred_lang, best_score).

    Scores every language's stopword list against the token stream and
    picks the max, ties broken by LANG_PRIORITY order. Falls back to
    'unknown' when nothing matches. Pure projection — no shuffle.
    """
    toks = F.col("__toks")
    scored = _with_tokens(docs, text_col, id_col).select(
        F.col(id_col),
        *[
            _stopword_hits(toks, LANG_STOPWORDS[lang]).alias(f"score_{lang}")
            for lang in LANG_PRIORITY
        ],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_PRIORITY])
    pred: Column = F.lit("unknown")
    for lang in reversed(LANG_PRIORITY):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("unknown"))
    return scored.select(
        F.col(id_col), pred.alias("pred_lang"), best.cast("long").alias("best_score")
    )


def doc_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prepared: bool = False,
) -> DataFrame:
    """Heuristic quality scores per document.

    Emits n_chars / n_tokens / avg token length / digit ratio /
    punctuation ratio / (english-)stopword ratio and a composite
    quality_score in [0, 1]. All ratios guarded against empty docs.
    ``prepared``: see :func:`_with_tokens`.
    """
    docs = _with_tokens(docs, text_col, id_col, prepared)
    s = F.col("__norm")
    toks = F.col("__toks")
    n_chars = F.length(s)
    n_tokens = F.size(toks)
    # NOTE (r17): translate()-based digit/punct counts and a
    # translate-spaces token-length sum were shipped early this round
    # on a "1.36× at sf1" reading and REVERTED after clean interleaved
    # A/Bs on an idle box: all-translate measured 0.91× at sf0.1 and
    # 0.77–0.88× at sf1 on the noop sink (4-variant matrix: all-regex
    # 0.814 s, either half-change ~0.824 s, all-translate 0.922 s at
    # sf1). Spark's translate builds a per-char dictionary probe;
    # compiled Java regex over these simple ASCII classes is simply
    # faster. The earlier number came from the box's slow-start phase
    # (canary 0.385 → 0.121 s across that session) — order-unbalanced
    # measurement, exactly what the interleaved protocol exists for.
    n_digits = n_chars - F.length(F.regexp_replace(s, r"[0-9]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(s, r"[^\w\s]", ""))
    n_stop = _stopword_hits(toks, LANG_STOPWORDS["en"])
    safe_chars = F.when(n_chars > 0, n_chars.cast("double"))
    safe_toks = F.when(n_tokens > 0, n_tokens.cast("double"))
    digit_ratio = F.coalesce(n_digits / safe_chars, F.lit(0.0))
    punct_ratio = F.coalesce(n_punct / safe_chars, F.lit(0.0))
    stop_ratio = F.coalesce(n_stop / safe_toks, F.lit(0.0))
    avg_tok_len = F.coalesce(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / safe_toks, F.lit(0.0)
    )
    length_score = F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0))
    quality = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(digit_ratio + punct_ratio, F.lit(1.0)))
    )
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        round_half_up(avg_tok_len, 4).alias("avg_token_len"),
        round_half_up(digit_ratio, 4).alias("digit_ratio"),
        round_half_up(punct_ratio, 4).alias("punct_ratio"),
        round_half_up(stop_ratio, 4).alias("stopword_ratio"),
        round_half_up(quality, 4).alias("quality_score"),
    )


#: BPE-ish pre-tokenization: letter runs, digit runs, single other marks
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts per doc → corpus rollup input.

    (id, ws_tokens, bpe_tokens, chars_per_bpe_token) — the BPE-ish
    count uses regexp_extract_all with a letter-run/digit-run/punct
    split, a deterministic stand-in for a real BPE vocab.
    """
    docs = _with_tokens(docs, text_col, id_col)
    s = F.col("__norm")
    ws_tokens = F.size(F.col("__toks"))
    bpe_tokens = F.size(F.regexp_extract_all(s, F.lit(BPE_ISH_PATTERN), 0))
    return docs.select(
        F.col(id_col),
        ws_tokens.cast("long").alias("ws_tokens"),
        bpe_tokens.cast("long").alias("bpe_tokens"),
        round_half_up(
            F.coalesce(F.length(s) / F.when(bpe_tokens > 0, bpe_tokens.cast("double")), F.lit(0.0)),
            4,
        ).alias("chars_per_bpe_token"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """C4/Gopher-style repetition signals per document:

    (id, n_words, dup_word_ratio, dup_bigram_ratio, top_word_share) —
    the duplicate-token and duplicate-bigram fractions plus the most
    frequent token's share of the document. High values flag the
    boilerplate / keyword-stuffed docs a training-data filter drops.

    Scale shape: word/bigram distinct-ratios are pure array projections
    (no shuffle). Only top_word_share aggregates — explode to
    (doc, token) with map-side combine, then a per-doc max: shuffle
    ∝ distinct (doc, token) pairs, the same O(corpus tokens) bound as
    any tokenizing pass. Zero-token docs survive with NULL ratios.
    """
    base = _with_tokens(docs, text_col, id_col)
    toks = F.col("__toks")
    n = F.size(toks)
    # bigrams via zip_with over the two shifted slices (empty when n<2)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stats = base.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("long").alias("__n_distinct"),
        F.size(bigrams).cast("long").alias("__n_bi"),
        F.size(F.array_distinct(bigrams)).cast("long").alias("__n_bi_distinct"),
    )
    top = (
        base.select(F.col(id_col), F.explode(toks).alias("__tok"))
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top_c"))
    )
    out = stats.join(top, on=id_col, how="left")
    safe_words = F.when(F.col("n_words") > 0, F.col("n_words").cast("double"))
    safe_bi = F.when(F.col("__n_bi") > 0, F.col("__n_bi").cast("double"))
    return out.select(
        F.col(id_col),
        F.col("n_words"),
        round_half_up(F.lit(1.0) - F.col("__n_distinct") / safe_words, 4).alias("dup_word_ratio"),
        round_half_up(F.lit(1.0) - F.col("__n_bi_distinct") / safe_bi, 4).alias("dup_bigram_ratio"),
        round_half_up(F.col("__top_c") / safe_words, 4).alias("top_word_share"),
    )


#: quality_filter rule thresholds — chosen to split the synthetic
#: corpus non-trivially; a production pipeline would tune per source.
QF_MIN_WORDS = 30
QF_MEAN_LEN_LO = 4.0
QF_MEAN_LEN_HI = 5.0
QF_MAX_DUP_RATIO = 0.5
QF_MIN_STOPWORDS = 3


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
    prepared: bool = False,
) -> DataFrame:
    """Gopher-style multi-rule quality filter → per-doc rule booleans +
    a combined verdict (id, n_words, mean_word_len, dup_word_ratio,
    n_stopwords, rule_*, passes).

    Every rule compares on the ROUNDED statistic so an engine-level
    last-ulp difference can never flip a document across a threshold.
    Pure Catalyst projection — no shuffle, no UDF; at 100 TB this is a
    map-only pass fused into the scan. ``keep_cols`` pass through for
    downstream rollups (avoids a join-back onto the same scan).
    ``prepared``: see :func:`_with_tokens` (only ``__toks`` is read).
    """
    if prepared:
        base = docs.select(
            F.col(id_col), *[F.col(c) for c in keep_cols], F.col("__toks")
        )
    else:
        base = docs.select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            word_tokens(F.col(text_col)).alias("__toks"),
        )
    toks = F.col("__toks")
    n = F.size(toks)
    safe_n = F.when(n > 0, n.cast("double"))
    mean_len = round_half_up(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / safe_n, 4
    )
    dup_ratio = round_half_up(F.lit(1.0) - F.size(F.array_distinct(toks)) / safe_n, 4)
    n_stop = _stopword_hits(toks, LANG_STOPWORDS["en"]).cast("long")
    r_words = n >= QF_MIN_WORDS
    r_len = (mean_len >= QF_MEAN_LEN_LO) & (mean_len <= QF_MEAN_LEN_HI)
    r_dup = dup_ratio <= QF_MAX_DUP_RATIO
    r_stop = n_stop >= QF_MIN_STOPWORDS
    return base.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        dup_ratio.alias("dup_word_ratio"),
        n_stop.alias("n_stopwords"),
        r_words.alias("rule_min_words"),
        r_len.alias("rule_word_len"),
        r_dup.alias("rule_dup"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_len & r_dup & r_stop).alias("passes"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 of normalized text + 64-bit xxhash and
    a prefix fingerprint (first 64 normalized chars) for fast blocking."""
    docs = _with_tokens(docs, text_col, id_col)
    s = F.col("__norm")
    return docs.select(
        F.col(id_col),
        md5_fingerprint(s).alias("fingerprint_md5"),
        F.xxhash64(s).alias("fingerprint_x64"),
        F.md5(F.substring(s, 1, 64)).alias("prefix_md5"),
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram language-model quality signal per document.

    Trains the LM on the corpus itself — token unigram frequencies —
    and scores each document by the average natural-log probability of
    its token instances (the CCNet / KenLM-style "perplexity" quality
    filter, reduced to the order-0 model a pure SQL engine can state
    exactly; real pipelines swap in a pretrained KenLM binary at this
    same seam). Low ``avg_logprob`` = rare-token-heavy documents
    (boilerplate, code dumps, mangled encodings); high = stopword-ish
    common text. No smoothing is needed: every scored token was seen
    by the trainer (count >= 1) so probabilities are never zero.

    Scale shape: three keyed shuffles — explode → groupBy(token)
    counts (map-side combine over the Zipf head), token-keyed join of
    instances to counts, groupBy(doc). The grand-total token count is
    a one-row aggregate broadcast into the plan, never a driver
    round-trip. Vocabulary is deliberately NOT broadcast (unbounded at
    corpus scale — same reasoning as docs_tfidf_topterms).

    Output: (id, n_tokens, avg_logprob) for documents with >= 1 token.
    """
    toks = _with_tokens(docs, text_col, id_col)
    inst = toks.filter(F.col("__norm").isNotNull()).select(
        F.col(id_col), F.explode("__toks").alias("tok")
    )
    cnt = inst.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = cnt.agg(F.sum("c").cast("double").alias("n_total"))
    return (
        inst.join(cnt, "tok")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            round_half_up(
                F.avg(F.log(F.col("c").cast("double") / F.col("n_total"))), 4
            ).alias("avg_logprob"),
        )
    )


def bigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-1 (bigram) language-model quality signal per document —
    one LM order above :func:`unigram_logprob`, and the point where
    word ORDER starts to matter: shuffled-token spam that fools the
    unigram filter scores low here because its transitions are rare.

    The model is trained on the corpus itself: P(cur|prev) =
    count(prev cur) / count(prev as a bigram prefix). Every scored
    transition was seen by the trainer, so no smoothing is needed
    (probabilities are never zero) — the same closed-world framing as
    the unigram scorer; real pipelines swap a pretrained KenLM at this
    seam. Documents need ≥2 tokens to have a transition.

    Scale shape: the bigram instance table is built map-only
    (``sequence`` + ``element_at`` in one projection, rows = tokens −
    1 per doc); then the unigram scorer's shuffle plan one order up —
    groupBy(prev, cur) counts, groupBy(prev) prefix counts (both
    map-side combining over the Zipf head), two keyed joins of
    instances to counts, groupBy(doc). Neither count table is
    broadcast (unbounded vocabulary² at corpus scale).

    Output: (id, n_bigrams, avg_logprob 4dp) for docs with ≥2 tokens.
    """
    toks = _with_tokens(docs, text_col, id_col)
    pair = lambda i: F.struct(  # noqa: E731 — element_at is 1-based
        F.element_at("__toks", i).alias("prev"),
        F.element_at("__toks", i + 1).alias("cur"),
    )
    inst = (
        toks.filter(F.size("__toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(F.sequence(F.lit(1), F.size("__toks") - 1), pair)
            ).alias("__b"),
        )
        .select(id_col, F.col("__b.prev").alias("prev"), F.col("__b.cur").alias("cur"))
    )
    big = inst.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("__cb"))
    ctx = inst.groupBy("prev").agg(F.count(F.lit(1)).alias("__cp"))
    return (
        inst.join(big, ["prev", "cur"])
        .join(ctx, "prev")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            round_half_up(
                F.avg(F.log(F.col("__cb").cast("double") / F.col("__cp"))), 4
            ).alias("avg_logprob"),
        )
    )


def dsir_logratio(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance score per document (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    reduced to the unigram feature space a SQL engine states exactly;
    real pipelines swap hashed-ngram features at this same seam).

    ``target_pred`` marks the target distribution (e.g. curated /
    in-domain docs); every document — target or not — is scored by the
    average per-token log importance ratio

        log( p_target(tok) / p_corpus(tok) )

    with add-1 smoothing over the CORPUS vocabulary on both sides
    (the target sample is sparse, so unsmoothed target probabilities
    would be −inf for any token the target never saw). High score =
    "looks like the target"; resample the corpus ∝ exp(score) or keep
    top-k to shift the training mixture toward the target domain.

    Scale shape: one explode; ONE groupBy(token) computing corpus and
    target counts together (the target count is a conditional sum —
    no second aggregation over the instance table); vocabulary-level
    scalars (V, N, N_target) reduce that token table to one broadcast
    row; a token-keyed join scores instances; groupBy(doc) averages.
    The vocabulary table is deliberately NOT broadcast (unbounded at
    corpus scale); everything shuffles on token or doc id only.

    Output: (id, n_tokens, is_target, dsir_score 4dp) for docs with
    ≥ 1 token.
    """
    base = docs.select(
        F.col(id_col),
        target_pred.cast("boolean").alias("__tgt"),
        word_tokens(F.col(text_col)).alias("__toks"),
    )
    inst = base.filter(F.size("__toks") > 0).select(
        F.col(id_col), "__tgt", F.explode("__toks").alias("tok")
    )
    cnt = inst.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("ct"),
    )
    scalars = cnt.agg(
        F.count(F.lit(1)).cast("double").alias("v"),
        F.sum("c").cast("double").alias("n_all"),
        F.sum("ct").cast("double").alias("n_tgt"),
    )
    scored = cnt.join(F.broadcast(scalars)).select(
        "tok",
        (
            F.log((F.col("ct") + 1.0) / (F.col("n_tgt") + F.col("v")))
            - F.log((F.col("c") + 1.0) / (F.col("n_all") + F.col("v")))
        ).alias("__lr"),
    )
    return (
        inst.join(scored, "tok")
        .groupBy(id_col, "__tgt")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            round_half_up(F.avg("__lr"), 4).alias("dsir_score"),
        )
        .withColumnRenamed("__tgt", "is_target")
        .select(id_col, "n_tokens", "is_target", "dsir_score")
    )


def bpe_pair_counts(
    docs: DataFrame,
    top_n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """First BPE merge iteration over the corpus: the ``top_n`` most
    frequent ADJACENT CHARACTER PAIRS inside words, weighted by word
    frequency — exactly the statistic the classic BPE trainer
    (Sennrich et al. 2016) maximizes when choosing its next merge.
    Iterating this (re-segment on the merged symbol, recount) trains a
    tokenizer; one iteration is the engine-shaped core: everything
    else is loop control.

    Scale shape: the pair expansion runs on the DISTINCT-WORD grain,
    not the token-instance grain — explode → groupBy(token) word
    frequencies first (map-side combine collapses the Zipf head), then
    a map-only ``transform(sequence)`` fans each distinct word into
    its (len−1) overlapping 2-char substrings carrying the word's
    frequency, and one groupBy(pair) sums. Final top-n is a
    TakeOrderedAndProject, never a global sort.

    Output: (pair, pair_count) — count desc, pair asc, top_n rows.
    """
    base = docs.select(word_tokens(F.col(text_col)).alias("__toks"))
    words = (
        base.select(F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("wf"))
        .filter(F.length("tok") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.substring(F.col("tok"), i, F.lit(2)),
            )
        ).alias("pair"),
        "wf",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(top_n)
    )


def readability(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease per document from three regex counts —
    words, sentence-ending punctuation runs, and vowel-group syllable
    estimates (the standard cheap syllable proxy). Score:

        206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    Sentence count is floored at 1 (a fragment without terminal
    punctuation is one sentence). Pure projection — zero shuffle, and
    the whole expression stays inside whole-stage codegen.

    Output: (id, n_words, n_sentences, n_syllables, flesch 2dp) for
    docs with ≥ 1 word.
    """
    base = _with_tokens(docs, text_col, id_col)
    s = F.col("__norm")
    words = F.size("__toks")
    sentences = F.greatest(F.regexp_count(s, F.lit(r"[.!?]+")), F.lit(1))
    syllables = F.size(F.regexp_extract_all(s, F.lit("[aeiouy]+"), 0))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / words.cast("double"))
    )
    return base.filter(words > 0).select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        round_half_up(flesch, 2).alias("flesch"),
    )


#: quality_logit weights — a deterministic stand-in for a trained
#: fastText/logistic quality classifier (the seam where learned
#: weights drop in; these are hand-set to be monotone in the features
#: a curation team actually uses: length up, stopwords up, symbol
#: noise down).
QUALITY_LOGIT_WEIGHTS = {
    "bias": -3.0,
    "log_len": 0.8,
    "avg_tok_len": 0.2,
    "stop_ratio": 4.0,
    "noise_ratio": -5.0,
}


def quality_logit(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Linear quality classifier score per document: a logistic model
    over the interpretable features of :func:`doc_quality`
    (log-length, mean token length, stopword ratio, digit+punct noise
    ratio) with fixed :data:`QUALITY_LOGIT_WEIGHTS`. This is the
    model-based quality filter of the CCNet / GPT-3 pipelines with
    the learned weights replaced by a deterministic, SQL-statable
    vector — swap in trained coefficients without touching the plan.

    Map-only single projection (zero shuffle); the sigmoid is rounded
    to 4dp and ``keep`` thresholds on the ROUNDED score so a last-ulp
    exp() disagreement can never flip a row.

    Output: (id, quality_prob 4dp, keep boolean) for all documents
    with non-null normalized text.
    """
    w = QUALITY_LOGIT_WEIGHTS
    base = _with_tokens(docs, text_col, id_col)
    s = F.col("__norm")
    toks = F.col("__toks")
    n_chars = F.length(s)
    n_tokens = F.size(toks)
    safe_chars = F.when(n_chars > 0, n_chars.cast("double"))
    safe_toks = F.when(n_tokens > 0, n_tokens.cast("double"))
    n_digits = n_chars - F.length(F.regexp_replace(s, r"[0-9]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(s, r"[^\w\s]", ""))
    stop_ratio = F.coalesce(
        _stopword_hits(toks, LANG_STOPWORDS["en"]) / safe_toks, F.lit(0.0)
    )
    noise_ratio = F.coalesce((n_digits + n_punct) / safe_chars, F.lit(0.0))
    avg_tok_len = F.coalesce(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / safe_toks,
        F.lit(0.0),
    )
    z = (
        F.lit(w["bias"])
        + F.lit(w["log_len"]) * F.log(F.lit(1.0) + n_tokens.cast("double"))
        + F.lit(w["avg_tok_len"]) * avg_tok_len
        + F.lit(w["stop_ratio"]) * stop_ratio
        + F.lit(w["noise_ratio"]) * noise_ratio
    )
    prob = round_half_up(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    return base.filter(s.isNotNull()).select(
        F.col(id_col),
        prob.alias("quality_prob"),
        (prob >= 0.5).alias("keep"),
    )


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 50,
    vocab_cap: int = 65536,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Train a classic BPE merge list (Sennrich et al. 2016) on the
    corpus: iteratively merge the most frequent adjacent symbol pair,
    weighted by word frequency.

    Scale framing mirrors the IVF trainer: the TRAINING input is the
    distinct-word frequency table — vocabulary-sized, not corpus-
    sized — capped to the ``vocab_cap`` most frequent words
    (TakeOrdered, deterministic (wf desc, tok asc) cut) and collected
    to the driver, where the exact merge loop is pure Python over at
    most ``vocab_cap`` short symbol sequences. The Zipf tail beyond
    the cap contributes negligible pair mass; the merge list (the
    model artifact, ``n_merges`` rows) is what ships back to the
    cluster. Ties break deterministically by (count desc, pair asc).
    """
    from .dedup import word_tokens

    base = docs.select(word_tokens(F.col(text_col)).alias("__toks"))
    words = (
        base.select(F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("wf"))
        .filter(F.length("tok") >= 2)
        .orderBy(F.col("wf").desc(), F.col("tok").asc())
        .limit(vocab_cap)
        .collect()
    )
    vocab = [([*r["tok"]], int(r["wf"])) for r in words]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, wf in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wf
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for syms, _ in vocab:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply a trained merge list to one word: repeatedly merge the
    present pair with the LOWEST rank (training order) — the standard
    BPE apply, guaranteed to reproduce the training segmentation on
    words the trainer saw."""
    syms = [*word]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize_docs(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document subword statistics under a trained BPE merge list:
    (id, n_words, n_subwords, avg_subwords_per_word 4dp) — the
    tokenizer-fit readout (how much the learned vocab compresses this
    corpus; 1.0 = every word is a single learned symbol).

    Scale shape: segmentation runs ONCE PER DISTINCT WORD (an
    Arrow-batched pandas UDF on the vocabulary grain — the Zipf head
    never re-segments per instance), then one keyed join from the
    token-instance explode onto the word grain and a per-doc
    combining aggregate. The merge list rides into the UDF closure as
    ``n_merges`` tuples, broadcast-sized by construction.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf("int")
    def n_subwords(col: pd.Series) -> pd.Series:
        return col.map(lambda w: len(bpe_segment(w, ranks)))

    toks = docs.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("tok")
    )
    word_grain = (
        toks.select("tok").distinct().withColumn("n_sub", n_subwords("tok"))
    )
    return (
        toks.join(word_grain, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
        .withColumn(
            "avg_subwords_per_word",
            round_half_up(F.col("n_subwords") / F.col("n_words"), 4),
        )
    )


def tfidf_allpairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_cos: float = 0.6,
    max_df_frac: float = 0.2,
    max_df_abs: int = 10_000,
    top: int = 100,
) -> DataFrame:
    """All-pairs sparse TF-IDF cosine similarity via an INVERTED-INDEX
    self-join (Bayardo et al., "Scaling Up All Pairs Similarity
    Search"; the VERNICA-join shape) — the sparse-vector counterpart
    of the MinHash/SimHash near-dup family: exact cosine on the pruned
    term space, no signatures, no probability of missing a pair that
    shares indexed terms.

    Pruning is what makes the join tractable: tokens with document
    frequency < 2 cannot produce a pair and tokens above
    ``min(max_df_frac·N, max_df_abs)`` are stop-like boilerplate whose
    index buckets would dominate the join (Σ df² work) while carrying
    near-zero IDF weight — the same bucket-cap role as
    ``LSH_MAX_BUCKET_DEFAULT`` in the MinHash path, and like there the
    cap is an explicit parameter.

    Exactness: weights are smooth TF-IDF ``tf·(ln((N+1)/(df+1))+1)``
    quantized to 1e-3-scaled BIGINTs, so pair dot products and squared
    norms are exact integer sums (decimal-widened) — cosine is then a
    fixed 3-op double expression per pair, engine/partitioning
    independent. Norms are taken over the SAME pruned term space as
    the dot product, so cosine stays in [0, 1].

    Scale shape: tf on (doc, token) — one shuffle with map-side
    combine; df on token; the index self-join shuffles on token (the
    vocabulary is never broadcast); pair scores group on (a, b); the
    final top-k is ORDER BY + LIMIT (TakeOrderedAndProject, total
    order with (cos, a, b) tie-break).

    Output (≤ top rows): doc_a, doc_b, n_shared_tokens, cosine (4dp).
    """
    from . import caching

    tf = caching.persist_tracked(
        docs.select(
            F.col(id_col).alias("d"),
            F.explode(word_tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("d", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    nd = tf.select("d").distinct().agg(F.count(F.lit(1)).alias("nd"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    kept = (
        dfreq.crossJoin(F.broadcast(nd))
        .filter(
            (F.col("dfreq") >= 2)
            & (
                F.col("dfreq")
                <= F.greatest(
                    F.lit(2),
                    F.least(
                        F.floor(F.lit(max_df_frac) * F.col("nd")),
                        F.lit(max_df_abs),
                    ),
                )
            )
        )
        .select("token", "dfreq", "nd")
    )
    ii = caching.persist_tracked(
        tf.join(kept, "token").select(
            "token",
            "d",
            F.floor(
                F.col("tf")
                * (
                    F.log(
                        (F.col("nd") + F.lit(1)).cast("double")
                        / (F.col("dfreq") + F.lit(1))
                    )
                    + F.lit(1.0)
                )
                * F.lit(1000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("w"),
        )
    )
    # widen-first (the ols_two_feature._wide discipline): cast BEFORE
    # multiplying so w*w cannot wrap a BIGINT under non-ANSI Spark —
    # the DuckDB oracle widens to HUGEINT before its multiply
    norms = ii.groupBy("d").agg(
        F.sum(
            (F.col("w").cast("decimal(19,0)") * F.col("w").cast("decimal(19,0)")).cast(
                "decimal(38,0)"
            )
        ).alias("nsq")
    )
    a = ii.select(
        "token", F.col("d").alias("da"), F.col("w").alias("wa")
    )
    b = ii.select(
        "token", F.col("d").alias("db"), F.col("w").alias("wb")
    )
    pairs = (
        a.join(b, "token")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_tokens"),
            F.sum(
                (
                    F.col("wa").cast("decimal(19,0)")
                    * F.col("wb").cast("decimal(19,0)")
                ).cast("decimal(38,0)")
            ).alias("dot"),
        )
    )
    scored = (
        pairs.join(norms.withColumnRenamed("d", "da").withColumnRenamed("nsq", "na"), "da")
        .join(norms.withColumnRenamed("d", "db").withColumnRenamed("nsq", "nb"), "db")
        .withColumn(
            "cosine",
            round_half_up(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                4,
            ),
        )
        .filter(F.col("cosine") >= F.lit(min_cos))
    )
    return (
        scored.orderBy(
            F.col("cosine").desc(), F.col("da").asc(), F.col("db").asc()
        )
        .limit(top)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "n_shared_tokens",
            "cosine",
        )
    )
