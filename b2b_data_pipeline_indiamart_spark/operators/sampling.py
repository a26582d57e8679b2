"""Deterministic sampling and PII-scrubbing operators.

A training-data pipeline rebalances sources (downsample the dominant
language / source before training) and scrubs contact details. Both
operators here are pure Catalyst projections — map-only, no shuffle,
no UDF — and fully deterministic: the sampling decision is a pure
function of (stratum, id) via md5, so re-runs, retries, and different
partitionings all keep exactly the same rows. That determinism is what
makes distributed sampling reproducible at 100 TB — rand()-based
sampling changes under AQE retries and speculative execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Java-and-RE2-compatible patterns (no backrefs / lookaround, so the
#: same pattern string runs in Spark (Java regex) and DuckDB (RE2)).
EMAIL_PATTERN = r"[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9 -]{7,}[0-9]"


def redact_pii(col: Column) -> Column:
    """Replace emails then phone-like runs with typed placeholders.

    Email first: an email's digits could otherwise partially match the
    phone pattern, making the result order-dependent.
    """
    no_email = F.regexp_replace(col, EMAIL_PATTERN, "[EMAIL]")
    return F.regexp_replace(no_email, PHONE_PATTERN, "[PHONE]")


def pii_counts(col: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts — phones counted AFTER email
    redaction, mirroring redact_pii's replacement order."""
    n_email = F.size(F.regexp_extract_all(col, F.lit(EMAIL_PATTERN), 0))
    after = F.regexp_replace(col, EMAIL_PATTERN, "[EMAIL]")
    n_phone = F.size(F.regexp_extract_all(after, F.lit(PHONE_PATTERN), 0))
    return n_email.cast("long"), n_phone.cast("long")


_HEX_SPACE = 16**8  # md5-prefix sample keys are 8 hex chars


def _rate_to_hex(rate: float) -> str:
    return format(min(max(int(rate * _HEX_SPACE), 0), _HEX_SPACE - 1), "08x")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "v1",
) -> DataFrame:
    """Deterministic hash-threshold stratified sampling.

    A row is kept iff the first 8 hex chars of
    ``md5(seed:stratum:id)`` fall below the stratum's rate threshold —
    a pure per-row predicate, exactly reproducible in any engine with
    md5 (the DuckDB oracle uses the literal same expression). Rates
    >= 1.0 keep everything; the expected kept fraction of each stratum
    is its rate (exact in distribution, binomial per finite stratum).

    Adds a ``sample_key`` column (the hex prefix) for auditability.
    """
    key = F.substring(
        F.md5(
            F.concat_ws(
                ":", F.lit(seed), F.col(strata_col), F.col(id_col).cast("string")
            )
        ),
        1,
        8,
    )
    keep = F.lit(default_rate >= 1.0)
    if default_rate < 1.0:
        keep = key < F.lit(_rate_to_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        in_stratum = F.col(strata_col) == stratum
        stratum_keep = F.lit(True) if rate >= 1.0 else (key < F.lit(_rate_to_hex(rate)))
        keep = F.when(in_stratum, stratum_keep).otherwise(keep)
    return df.withColumn("sample_key", key).filter(keep)
