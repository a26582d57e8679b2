"""Unit tests for the round-5 operators: decontamination, gap fill,
scalar quantization, rollup. Value-level oracle parity is covered by
test_oracle_parity.py; these pin the operator semantics directly on
hand-built frames where the expected answer is obvious."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from b2b_data_pipeline_indiamart_spark.operators import decontam, similarity, temporal
from b2b_data_pipeline_indiamart_spark.plans import QUERIES


def test_decontaminate_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta zeta"),  # shares the 4-gram a b g d
            (2, "zeta eta theta iota kappa"),  # no overlap
            (3, "tiny doc"),  # shorter than n -> never contaminated
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: (r["shared_ngrams"], r["contaminated"])
        for r in decontam.decontaminate(train, bench, n=4).collect()
    }
    assert rows[1] == (1, True)
    assert rows[2] == (0, False)
    assert rows[3] == (0, False)
    assert len(rows) == 3  # every training doc appears


def test_decontaminate_counts_distinct_grams_once(spark):
    # the same shared 4-gram repeated in one training doc counts once
    bench = spark.createDataFrame([(9, "a b c d")], ["doc_id", "text"])
    train = spark.createDataFrame([(1, "a b c d x a b c d")], ["doc_id", "text"])
    [r] = decontam.decontaminate(train, bench, n=4).collect()
    assert r["shared_ngrams"] == 1 and r["contaminated"]


def test_decontaminate_benchmark_set_is_broadcast(spark, sf_small):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["docs_decontaminate"](spark, sf_small).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_gap_fill_zero_fills_and_carries(spark):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", "click", 4.0),
            (2, "2024-01-01 00:20:00", "click", 6.0),
            # hour 01 empty for click -> gap, carries 5.0 forward
            (3, "2024-01-01 02:30:00", "click", 2.0),
            (4, "2024-01-01 00:15:00", "view", 1.0),
        ],
        ["event_id", "ts_s", "event_type", "value"],
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    out = temporal.gap_fill_hourly(events, "event_type")
    rows = {(r["event_type"], r["hour_start"]): r for r in out.collect()}
    # spine: 3 hours x 2 types = 6 rows
    assert len(rows) == 6
    g = rows[("click", "2024-01-01 01:00:00")]
    assert g["is_gap"] and g["n_events"] == 0
    assert g["avg_value"] is None and g["filled_avg_value"] == 5.0
    # view has no events after hour 0: zero-filled, average carried
    v = rows[("view", "2024-01-01 02:00:00")]
    assert v["n_events"] == 0 and v["filled_avg_value"] == 1.0
    assert rows[("click", "2024-01-01 02:00:00")]["avg_value"] == 2.0


def test_scalar_quantize_bounds_and_determinism(spark):
    emb = spark.createDataFrame(
        [
            (1, [0.0, 10.0, 7.0]),
            (2, [5.0, 20.0, 7.0]),
            (3, [10.0, 15.0, 7.0]),
        ],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r["codes"] for r in similarity.scalar_quantize(emb).collect()}
    # per-dim min -> 0, max -> 255, midpoint -> round(127.5) = 128;
    # constant dim (mx == mn) codes to 0
    assert out[1] == [0, 0, 0]
    assert out[2] == [128, 255, 0]
    assert out[3] == [255, 128, 0]
    again = {r["vec_id"]: r["codes"] for r in similarity.scalar_quantize(emb).collect()}
    assert out == again


def test_scalar_quantize_codes_in_range(spark, sf_small):
    out = QUERIES["embedding_quantize"](spark, sf_small).collect()
    assert all(0 <= int(c) <= 255 for r in out for c in r["codes_csv"].split(","))
    assert all(r["n_dims"] == 64 for r in out)


def test_orders_rollup_levels_reconcile(spark, sf_small):
    rows = QUERIES["orders_rollup"](spark, sf_small).collect()
    data = [r for r in rows if r["g_year"] == 0 and r["g_priority"] == 0]
    yearly = [r for r in rows if r["g_year"] == 0 and r["g_priority"] == 1]
    [total] = [r for r in rows if r["g_year"] == 1]
    assert total["order_year"] == "ALL" and total["order_priority"] == "ALL"
    assert sum(r["n_orders"] for r in data) == total["n_orders"]
    assert sum(r["n_orders"] for r in yearly) == total["n_orders"]
    assert sum(r["revenue"] for r in yearly) == pytest.approx(total["revenue"], abs=0.05)


def test_ann_sq8_deterministic_and_close_to_exact(spark, sf_small):
    sq8 = QUERIES["ann_sq8"](spark, sf_small)
    first = [tuple(r) for r in sq8.collect()]
    again = [tuple(r) for r in QUERIES["ann_sq8"](spark, sf_small).collect()]
    assert first == again
    # recall@10 vs the exact brute-force ranking: SQ8 on 64 dims loses
    # little — demand at least 8 of 10 shared neighbors per query
    exact = QUERIES["ann_topk"](spark, sf_small).collect()
    by_q_exact: dict = {}
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    by_q_sq8: dict = {}
    for qid, nid, _sim, _rnk in first:
        by_q_sq8.setdefault(qid, set()).add(nid)
    for qid, exact_set in by_q_exact.items():
        got = by_q_sq8.get(qid, set())
        assert len(exact_set & got) >= 8, f"query {qid}: recall too low"


def test_chunk_documents_overlap_and_ragged_tail(spark):
    from b2b_data_pipeline_indiamart_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(11))),  # 11 toks: chunks at 0,4,8
            (2, "a b"),  # single short chunk
            (3, "   "),  # normalizes to null -> no chunks
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, size=6, stride=4)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert {k[0] for k in rows} == {1, 2}
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3 t4 t5"
    assert rows[(1, 1)]["chunk_text"] == "t4 t5 t6 t7 t8 t9"  # 2-token overlap
    assert rows[(1, 2)]["chunk_text"] == "t8 t9 t10" and rows[(1, 2)]["n_tokens"] == 3
    assert rows[(2, 0)]["n_tokens"] == 2
    # every token of doc 1 is covered by at least one chunk
    covered = set()
    for (d, _), r in rows.items():
        if d == 1:
            covered.update(r["chunk_text"].split())
    assert covered == {f"t{i}" for i in range(11)}


def test_tfidf_ranks_distinctive_terms_first(spark, sf_small):
    rows = QUERIES["docs_tfidf_topterms"](spark, sf_small).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        assert len(doc_rows) <= 3
        ranks = sorted(r["rank"] for r in doc_rows)
        assert ranks == list(range(1, len(doc_rows) + 1))
        ordered = sorted(doc_rows, key=lambda r: r["rank"])
        scores = [r["tfidf"] for r in ordered]
        assert scores == sorted(scores, reverse=True)


def test_price_bands_sketch_tracks_exact_percentiles(spark, sf_small):
    exact = {r["p_brand"]: r for r in QUERIES["price_percentile_bands"](spark, sf_small).collect()}
    sketch = {r["p_brand"]: r for r in QUERIES["price_bands_sketch"](spark, sf_small).collect()}
    assert set(exact) == set(sketch)
    for brand, e in exact.items():
        s = sketch[brand]
        assert s["n_parts"] == e["n_parts"]
        for q in ("p25", "p50", "p75", "p95"):
            # accuracy=10000 on small groups: the sketch returns an
            # actual sample value; allow a 5% relative band
            assert abs(s[q] - e[q]) <= max(0.05 * abs(e[q]), 1.0), (brand, q)
    # determinism across runs (driver may re-run rows-only keys)
    again = [tuple(r) for r in QUERIES["price_bands_sketch"](spark, sf_small).collect()]
    assert again == [tuple(r) for r in QUERIES["price_bands_sketch"](spark, sf_small).collect()]
