"""End-to-end ETL pipeline test on a synthetic IndiaMART-style raw CSV
(the reference's input shape: etl.py load_raw_data → export_outputs)."""

from __future__ import annotations

import sqlite3

import pytest

from b2b_data_pipeline_indiamart_spark.pipeline import (
    DEFAULT_FINAL_COLUMNS,
    ETLConfig,
    run_pipeline,
)

RAW_HEADER = (
    "Search Keyword,Product Name,Supplier Name,City,State,Rating,Price,"
    "Phone,Product URL,Supplier URL,CatId,McatId,ItemId,DispId,Scraped At"
)

RAW_ROWS = [
    # normal row
    'bakery oven,Deck Oven,acme kitchen co,chennai,tamilnadu,4.5,"₹ 78,000/Piece",'
    "+91 98765-43210,https://x.in/p/1,https://x.in/s/1,1,2,100,1000,2026-01-01T00:00:00",
    # duplicate of row 1 by (product_url, dispid) — must be dropped
    'bakery oven,Deck Oven DUP,acme kitchen co,chennai,tamilnadu,4.5,"₹ 78,000/Piece",'
    "+91 98765-43210,https://x.in/p/1,https://x.in/s/1,1,2,101,1000,2026-01-01T00:00:01",
    # Ask Price → NULL price; missing city; rating out of range
    "mixer grinder,Mixie 750W,globex,,kerala,9.9,Ask Price,"
    ",https://x.in/p/2,https://x.in/s/2,1,2,102,1001,2026-01-01T00:00:02",
    # missing product name → critical drop + issue; bad URL
    "mixer grinder,,globex,kochi,kerala,4.0,₹ 500/Unit,"
    ",notaurl,https://x.in/s/3,1,2,103,1002,2026-01-01T00:00:03",
    # null-ish tokens → NULL; unmapped state
    "wet & dry vacuum cleaner,VacPro,NaN,mumbai,sikkim,3.0,₹ 1500/Piece,"
    ",https://x.in/p/4,https://x.in/s/4,1,2,104,1003,2026-01-01T00:00:04",
]


@pytest.fixture()
def raw_csv(tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text(RAW_HEADER + "\n" + "\n".join(RAW_ROWS) + "\n", encoding="utf-8-sig")
    return p


def test_run_pipeline_end_to_end(spark, raw_csv, tmp_path):
    cfg = ETLConfig(
        input_file=str(raw_csv),
        output_csv=str(tmp_path / "clean.csv"),
        profile_report=str(tmp_path / "profile.csv"),
        quality_issues=str(tmp_path / "issues.csv"),
        output_db=str(tmp_path / "products.db"),
    )
    out = run_pipeline(spark, cfg)

    final = {r["dispid"]: r for r in out["final"].collect()}
    # exact curated column set + order (etl.py:403-408)
    assert out["final"].columns == list(DEFAULT_FINAL_COLUMNS)
    # dup dropped (keep-first = lowest itemid); the missing-name row AND
    # the scrubbed-"NaN"-supplier row fail drop_critical_missing
    assert sorted(final) == [1000.0, 1001.0]

    r1 = final[1000.0]
    assert r1["price_numeric"] == 78000.0
    assert r1["price_unit"] == "Piece"
    assert r1["price_bucket"] == "High (50k+)"
    assert r1["state"] == "Tamil Nadu"          # alias fix
    assert r1["supplier_region"] == "South"
    assert r1["supplier_name"] == "Acme Kitchen Co"  # title case
    assert r1["search_keyword"] == "bakery oven"

    r2 = final[1001.0]
    assert r2["price_numeric"] is None           # Ask Price
    assert r2["price_bucket"] == "Unknown"
    assert r2["city"] == "Unknown"               # fill_unknown

    issues = {(r["row_key"], r["issue"]) for r in out["issues"].collect()}
    assert (1001, "rating_out_of_range") in issues
    assert (1002, "missing_product_name") in issues
    assert (1002, "invalid_product_url") in issues
    assert (1003, "missing_supplier_name") in issues  # "NaN" scrubbed to NULL

    profile = {r["column"]: r for r in out["profile"].collect()}
    assert profile["price_numeric"]["nulls"] == 1
    assert profile["product_name"]["n_rows"] == 2

    con = sqlite3.connect(cfg.output_db)
    n, regions = con.execute(
        "SELECT COUNT(*), COUNT(DISTINCT supplier_region) FROM products"
    ).fetchone()
    con.close()
    assert n == 2 and regions == 1  # both survivors roll up to South


def test_analyze_chart_set(spark, raw_csv, tmp_path):
    from b2b_data_pipeline_indiamart_spark.pipeline import analyze

    cfg = ETLConfig(
        input_file=str(raw_csv),
        output_csv=str(tmp_path / "clean.csv"),
        profile_report=str(tmp_path / "profile.csv"),
        quality_issues=str(tmp_path / "issues.csv"),
        export_sqlite=False,
    )
    final = run_pipeline(spark, cfg)["final"]
    charts = analyze(final)
    assert set(charts) >= {
        "kpi_cards", "avg_price_by_keyword", "top_cities", "keyword_share",
        "city_index", "count_avg_combo", "treemap_top8",
        "top10_price_cumulative", "price_histogram", "rating_price_scatter",
    }
    kpi = charts["kpi_cards"].collect()[0]
    assert kpi["total_rows"] == 2 and kpi["n_keywords"] == 2
    share = {r["label"]: r["share_pct"] for r in charts["keyword_share"].collect()}
    assert abs(sum(share.values()) - 100.0) < 0.02
    hist = charts["price_histogram"].collect()
    assert sum(r["cnt"] for r in hist) == 1  # one priced row survives the clip


def test_winsorize_branch_keeps_null_price_unknown(spark, tmp_path):
    # ≥10 non-null prices triggers the winsorize branch (etl.py:303-306);
    # the rows with no price must still bucket to 'Unknown' — an unguarded
    # clip would rewrite NULL to the lower IQR bound and mis-bucket them.
    p = tmp_path / "raw.csv"
    priced = [
        f"Widget {i},Acme,₹ {1000 * (i + 1)}/Piece,{i}" for i in range(12)
    ]
    unpriced = ["NoPrice A,Acme,Ask Price,100", "NoPrice B,Acme,Get Quote,101"]
    p.write_text(
        "Product Name,Supplier Name,Price,DispId\n" + "\n".join(priced + unpriced) + "\n"
    )
    cfg = ETLConfig(
        input_file=str(p),
        output_csv=str(tmp_path / "clean.csv"),
        profile_report=str(tmp_path / "profile.csv"),
        quality_issues=str(tmp_path / "issues.csv"),
        export_sqlite=False,
    )
    rows = {r["dispid"]: r for r in run_pipeline(spark, cfg)["final"].collect()}
    assert len(rows) == 14
    for key in (100.0, 101.0):
        assert rows[key]["price_numeric"] is None
        assert rows[key]["price_bucket"] == "Unknown"
    assert rows[0.0]["price_bucket"] == "Low (<10k)"


def test_pipeline_without_phone_or_sqlite(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text(
        "Product Name,Supplier Name,Price,DispId\n"
        "Widget,Acme,₹ 100/Piece,1\nGadget,Globex,₹ 20000/Set,2\n"
    )
    cfg = ETLConfig(
        input_file=str(p),
        output_csv=str(tmp_path / "clean.csv"),
        profile_report=str(tmp_path / "profile.csv"),
        quality_issues=str(tmp_path / "issues.csv"),
        export_sqlite=False,
        winsorize_price=False,
    )
    out = run_pipeline(spark, cfg)
    rows = out["final"].collect()
    assert len(rows) == 2
    # absent source columns surface as NULL in the curated schema
    assert all(r["search_keyword"] is None for r in rows)
    assert {r["price_bucket"] for r in rows} == {"Low (<10k)", "Mid (10k-50k)"}


def test_observe_quality_metrics_ride_the_action(spark):
    from pyspark.sql import functions as F

    from b2b_data_pipeline_indiamart_spark.operators.profiling import observe_quality

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id long, v double"
    )
    observed, obs = observe_quality(
        df, numeric_col="v", required_cols=["v"]
    )
    # one action drives both the "real work" and the metrics
    assert observed.filter(F.col("id") > 0).count() == 3
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_null_v"] == 1
    assert got["sum_v"] == 40.0
    assert got["min_v"] == 10.0 and got["max_v"] == 30.0
