"""Repetition stats and Gopher-style quality filter: hand-built edge
cases the corpus doesn't cover (empty / single-token / all-duplicate
docs) plus rule-threshold behavior."""

from __future__ import annotations

import pytest

from b2b_data_pipeline_indiamart_spark.operators import textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_all_duplicates(spark):
    out = {
        r["doc_id"]: r
        for r in textstats.repetition_stats(
            _docs(spark, [(1, "spam spam spam spam"), (2, "all words here differ")])
        ).collect()
    }
    assert out[1]["n_words"] == 4
    assert out[1]["dup_word_ratio"] == 0.75
    assert out[1]["dup_bigram_ratio"] == pytest.approx(1 - 1 / 3, abs=1e-4)
    assert out[1]["top_word_share"] == 1.0
    assert out[2]["dup_word_ratio"] == 0.0
    assert out[2]["top_word_share"] == 0.25


def test_repetition_degenerate_docs(spark):
    out = {
        r["doc_id"]: r
        for r in textstats.repetition_stats(
            _docs(spark, [(1, None), (2, "solo"), (3, "   ")])
        ).collect()
    }
    # NULL / whitespace-only normalize to NULL (the null-token scrub):
    # rows survive with NULL stats — identical to the DuckDB oracle,
    # where len(string_split_regex(NULL)) is NULL too
    for d in (1, 3):
        assert out[d]["n_words"] is None
        assert out[d]["dup_word_ratio"] is None
        assert out[d]["top_word_share"] is None
    # one token: no bigrams, but word stats defined
    assert out[2]["n_words"] == 1
    assert out[2]["dup_word_ratio"] == 0.0
    assert out[2]["dup_bigram_ratio"] is None
    assert out[2]["top_word_share"] == 1.0


def test_quality_filter_rules(spark):
    good = " ".join(["the"] * 3 + [f"word{i:02d}" for i in range(40)])  # mean len 5.79 > hi
    # passes every rule: 33 >= 30 words, mean len (8 + 30*5)/33 = 4.79,
    # dup ratio 2/33 <= 0.5, 3 stopwords
    passing = " ".join(["the", "and", "of"] + [f"w{i:04d}" for i in range(30)])
    short = "the and of tiny doc"
    out = {
        r["doc_id"]: r
        for r in textstats.quality_filter(
            _docs(spark, [(1, passing), (2, short), (3, good)])
        ).collect()
    }
    assert out[1]["passes"] is True
    assert out[2]["passes"] is False and out[2]["rule_min_words"] is False
    # doc 3: mean word length pushed above 5.0 by the long words
    assert out[3]["rule_word_len"] is False and out[3]["passes"] is False


def test_quality_filter_is_shuffle_free(spark):
    df = textstats.quality_filter(_docs(spark, [(1, "a doc")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
