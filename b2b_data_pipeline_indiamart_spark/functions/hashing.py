"""Hash-based anonymization / fingerprint expressions.

Parity: reference ``etl.py`` ``sha256_hash`` (etl.py:148-152) and
``clean_phone_digits`` (etl.py:140-145). Spark's ``sha2``/``md5`` are
JVM intrinsics — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: same default salt as the reference (etl.py:148)
DEFAULT_SALT = "indiamart_etl_salt"


def digits_only(col: Column) -> Column:
    """Keep only digits; empty → NULL (etl.py:140-145)."""
    d = F.regexp_replace(col.cast("string"), r"\D", "")
    return F.when(d.isNull() | (d == ""), F.lit(None).cast("string")).otherwise(d)


def salted_sha256(col: Column, salt: str = DEFAULT_SALT) -> Column:
    """sha256("<salt>::<value>") hex digest; NULL-safe (etl.py:148-152)."""
    return F.when(
        col.isNull(),
        F.lit(None).cast("string"),
    ).otherwise(F.sha2(F.concat(F.lit(f"{salt}::"), col.cast("string")), 256))


def md5_fingerprint(col: Column) -> Column:
    """md5 of a normalized string — exact-dedup / fingerprint key."""
    return F.md5(col.cast("string"))
