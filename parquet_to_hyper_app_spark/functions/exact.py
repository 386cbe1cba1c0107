"""Exact (order-independent) float aggregation for oracle parity.

Summing doubles is order-dependent; Spark's partial aggregates and
DuckDB combine in different orders, so a raw `sum(double)` differs in
the last ulps and `round(sum, 2)` sits on .xx5 ties for money-like data
(2–6 true decimals), flipping the cent nondeterministically.

The fix used by every money aggregate in this engine: cast the operands
to exact DECIMAL first, multiply/sum in decimal (exact, order
independent), and cast the final aggregate back to DOUBLE — both
engines then produce the nearest-double of the *same exact decimal*,
i.e. bitwise-identical results with no rounding step at all.

DECIMAL(12,2) is chosen so a triple product stays within both engines'
38-digit cap without precision-loss adjustment:
Spark (p1+p2+1 rule): (12,2)×(12,2)→(25,4); ×(12,2)→(38,6) — no loss.
DuckDB (w1+w2 rule):  (12,2)×(12,2)→(24,4); ×(12,2)→(36,6) — fits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: SQL snippet mirror: CAST(x AS DECIMAL(12,2))
DEC = "DECIMAL(12,2)"


def dec2(c: Column | str) -> Column:
    """Cast a money-like double column/expression to exact DECIMAL(12,2)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(12,2)")


def exact_sum(term: Column) -> Column:
    """Order-independent sum of a decimal term, surfaced as DOUBLE."""
    return F.sum(term).cast("double")
