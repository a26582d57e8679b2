"""Geography rollup expressions.

Parity: reference ``etl.py`` ``supplier_region_from_state``
(etl.py:178-197): a state→region lookup. In the engine the rollup is
expressed two ways:

- ``state_to_region`` — a literal CASE mapping (exact reference parity,
  for flat listing-style inputs);
- the star-schema way — join ``nation``→``region`` (see
  ``plans/queries.py::region_rollup``), which is what survives 100 TB:
  the dim join broadcasts, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Parity: etl.py:184-187
_REGIONS = {
    "South": ("tamil nadu", "kerala", "karnataka", "andhra pradesh", "telangana", "puducherry"),
    "West": ("maharashtra", "gujarat", "goa", "rajasthan"),
    "North": (
        "delhi",
        "punjab",
        "haryana",
        "uttar pradesh",
        "uttarakhand",
        "himachal pradesh",
        "jammu and kashmir",
    ),
    "East": ("west bengal", "odisha", "bihar", "jharkhand", "assam"),
}


def state_to_region(col: Column) -> Column:
    """State name → region label (etl.py:178-197).

    NULL/empty → "Unknown"; unmapped → "Other/Unknown".
    """
    s = F.lower(F.trim(col.cast("string")))
    expr = F.when(s.isNull() | (s == ""), F.lit("Unknown"))
    for region, states in _REGIONS.items():
        expr = expr.when(s.isin(*states), F.lit(region))
    return expr.otherwise(F.lit("Other/Unknown"))
