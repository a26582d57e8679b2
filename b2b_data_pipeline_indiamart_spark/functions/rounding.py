"""Engine-portable decimal rounding.

``round()`` implementations disagree at exact half-way points: Spark
rounds the *exact binary value* via BigDecimal HALF_UP, while DuckDB
rounds via scaled floating multiply — e.g. 0.86875 at 4dp becomes
0.8687 in one engine and 0.8688 in the other. Since the oracle gate
hash-compares values, every checked output instead uses

    floor(x * 10^n + 0.5) / 10^n

which is a pure IEEE-double composition: given bit-equal inputs it is
bit-equal everywhere. (Half-way values round toward +inf in both
engines — a consistent convention, which is what parity needs.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column | str, scale: int = 0) -> Column:
    """floor(x * 10^scale + 0.5) / 10^scale, NULL-safe.

    Accepts a column or a column name (same contract as ``F.round``).
    """
    if isinstance(col, str):
        col = F.col(col)
    p = float(10**scale)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def exact_avg(col: Column | str, scale: int = 2, out_scale: int | None = None) -> Column:
    """Order-independent mean of DECIMAL-QUANTIZED doubles — the
    aggregate to use instead of ``round_half_up(F.avg(x), k)`` whenever
    ``x`` is a money/probability column that is exact at ``scale``
    decimal digits (2dp prices, 4dp probabilities, 2dp-rounded sums).

    Why: ``avg`` over such values is a float reduction whose ±1-ulp
    result depends on summation order (partitioning, cache state,
    engine), and the TRUE mean of small-denominator rationals lands
    EXACTLY on rounding boundaries often (mean of 1 and 2 cents =
    0.015), so the final round can flip between runs or engines — the
    round-10 ``events_session_stats`` parity flake. Fix: recover the
    integers (``floor(x·10^scale + 0.5)``), sum as BIGINT (exact in
    any order), divide once, round once. NULL-safe like ``avg``
    (nulls drop from both sum and count).

    SQL twin (floorize rewrites the inner round to the same floor
    form):  ``round(sum(CAST(round(x * 10^s) AS BIGINT))
    / (count(x) * 10^s.0), k)``.
    """
    if isinstance(col, str):
        col = F.col(col)
    p = float(10**scale)
    ints = F.floor(col * F.lit(p) + F.lit(0.5)).cast("long")
    return round_half_up(
        F.sum(ints) / (F.count(col) * F.lit(p)),
        scale if out_scale is None else out_scale,
    )


def money_ints(col: Column | str, scale: int = 2) -> Column:
    """Exact BIGINT recovery of a decimal-quantized double:
    ``floor(x*10^scale + 0.5)`` — the per-row building block of
    :func:`exact_sum` (and the same recovery :func:`exact_avg` uses).
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.floor(col * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")


def exact_sum(
    int_expr: Column, den_scale: int, out_scale: int = 2,
    wide: bool = False,
) -> Column:
    """Order-independent rounded SUM of decimal-quantized money
    products — the sum-side counterpart of :func:`exact_avg`, closing
    the round-10 residual flake class (VERDICT r10 #1).

    A float ``sum(price * (1-disc))`` is an order-sensitive reduction;
    the boundary canary (tests/test_sum_boundary_canary.py) proved
    ~1% of such cells sit EXACTLY on a rounding midpoint at every
    tested SF, so the final ``floor(x*100+0.5)`` is literally
    sign-of-error — a partitioning change can flip it. Fix: recover
    exact integers per row (``money_ints`` products — one BIGINT per
    row, e.g. price_cents * (1-disc)_pct at scale 10^4), sum as BIGINT
    (exact in any order), divide ONCE by 10^den_scale, round ONCE.
    Both engines then compute the identical single IEEE composition of
    the identical integer — deterministic even when the exact value
    sits on a midpoint.

    SQL twin: ``round(sum(CAST(round(x*100) AS BIGINT) * ...)
    / 10^den.0, k)`` (DuckDB widens BIGINT sums to HUGEINT; Spark's
    LongType sum is exact to 2^63 — at 100 TB the 10^6-scale charge
    numerator approaches that, so cluster deployments pass
    ``wide=True``; the division is unchanged).

    ``wide=True`` (ADVICE r11) is the cluster-deployment shape: the
    per-row product is cast to DECIMAL(38,0) BEFORE the sum, so the
    aggregate is exact to 10^38 instead of wrapping silently at 2^63
    in non-ANSI mode (the 10^6-scale q1 charge numerator is ~2e17 at
    sf1 and crosses 2^63 around sf~40). The decimal sum then converts
    to double for the single division, so for any total below 2^63
    the result is BIT-IDENTICAL to the long path — the registry keys
    stay on the default long path only because it is what their
    hashes were pinned on and small-SF gates never overflow; a
    100 TB deployment flips the flag without renumbering anything.
    """
    total = F.sum(int_expr.cast("decimal(38,0)")) if wide else F.sum(int_expr)
    return round_half_up(
        total.cast("double") / F.lit(float(10**den_scale)), out_scale
    )


def floorize_round_sql(sql: str) -> str:
    """Rewrite every ``round(EXPR, n)`` in a SQL string to the
    floor-based form above. Balanced-paren aware; applied to oracle SQL
    at registration time so the source stays readable."""
    out = []
    i = 0
    lower = sql.lower()
    while True:
        j = lower.find("round(", i)
        if j < 0:
            out.append(sql[i:])
            break
        # make sure it's not part of a longer identifier
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i : j + 6])
            i = j + 6
            continue
        out.append(sql[i:j])
        depth = 0
        k = j + 5  # position of '('
        last_comma = -1
        while True:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                last_comma = k
            k += 1
        inner = sql[j + 6 : k]
        if last_comma < 0:
            scale = 0
            expr = inner
        else:
            expr = sql[j + 6 : last_comma]
            scale = int(sql[last_comma + 1 : k].strip())
        p = float(10**scale)
        out.append(f"(floor(({expr}) * {p} + 0.5) / {p})")
        i = k + 1
    return "".join(out)
