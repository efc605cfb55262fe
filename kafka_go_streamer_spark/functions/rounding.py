"""Cross-engine stable rounding.

Spark rounds DOUBLEs through BigDecimal HALF_UP on the shortest decimal
representation; DuckDB rounds the raw double in C. On exact ties
(x.xxx5 — common for ratios of small integers like 7/32 = 0.21875 and
for sums-of-cents divided by counts) the two disagree by one final-digit
step even when the underlying doubles are equal.

``stable_round`` adds a 1e-9 epsilon before rounding ON BOTH SIDES:
natural decimal ties move strictly above the boundary for both engines,
and the residual disagreement window shrinks from "any rational that
terminates at the rounding precision" (~1e-3 per row in practice) to
"value within float-error of boundary-minus-epsilon" (~1e-13).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-9


def stable_round(col: Column, scale: int) -> Column:
    return F.round(col + F.lit(EPS), scale)


def stable_round_sql(expr: str, scale: int) -> str:
    return f"round(({expr}) + 1e-9, {scale})"
