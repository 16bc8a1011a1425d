"""Cross-engine numeric helpers.

``round_duck``: bit-exact emulation of DuckDB's ``round(DOUBLE, d)``.

DuckDB rounds doubles as ``std::round(x * 10^d) / 10^d`` (half away
from zero on the SCALED double). Spark's ``F.round`` instead feeds the
double's shortest decimal representation through
``BigDecimal.setScale(d, HALF_UP)`` — a different function of the bits:
for x whose shortest repr reads ``0.1234565`` but whose exact binary
value is 0.12345649999..., Spark yields 0.123457 while DuckDB yields
0.123456. The r5 driver gate hashed five queries red on exactly this
last-ulp class (its float normalization is tighter than 6 significant
digits).

The emulation maps each DuckDB step onto an identical-on-doubles Spark
step: ``x * 10^d`` is the same IEEE multiply; ``F.round(y, 0)`` equals
C ``round(y)`` for every |y| < 2^52 (BigDecimal HALF_UP on the shortest
repr rounds half away from zero, and the shortest repr of a double
crosses an integer-plus-half boundary only when the double itself
does); the final divide is the same IEEE op. Verified bit-for-bit
against DuckDB over 8.6k adversarial quotients, exact .5 boundaries and
negatives (r6), and end-to-end by the strict (full-precision) oracle
comparison in scripts/check_oracles.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_duck(col: Column, digits: int = 6) -> Column:
    """DuckDB-bit-exact ``round(col, digits)`` for double columns.

    The zero branch preserves IEEE signed zero: ``std::round`` keeps
    the sign (round(-1e-9*1e6) = -0.0) while BigDecimal has no negative
    zero, so a negative input rounding to zero must re-acquire its sign
    (0.0 * signum(col) is -0.0 for negative col, 0.0 otherwise)."""
    scale = F.lit(float(10**digits))
    scaled = F.round(col * scale, 0)
    return F.when(scaled == F.lit(0.0), F.lit(0.0) * F.signum(col)).otherwise(
        scaled / scale
    )
