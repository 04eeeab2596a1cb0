"""Numeric-determinism helpers for oracle parity.

Floating-point SUM/AVG are order-dependent, and Spark and DuckDB both
aggregate in parallel with nondeterministic partial ordering — so a double
sum will not reliably hash-match between engines. The fix: round each input
to a decimal grid (cast double → DECIMAL(38,6) is well-defined: decimal
midpoints are never exactly representable in binary, so both engines round
to the same nearest), sum exactly in decimal, then cast the exact result
back to double. Both engines produce the identical IEEE double.

Use ``dsum``/``davg`` on the Spark side and the matching SQL shapes
(``SUM_D``/``AVG_D`` templates) on the DuckDB side.

CAVEAT (learned from an sf0.1 parity hit in s55): the decimal-cast trick
is guaranteed only for values already near a decimal grid (parquet
DECIMAL columns, money with 2dp, low-precision inputs). For COMPUTED
irrational doubles (sqrt/log/division outputs) the two engines' casts
can disagree on the last decimal digit with small but real probability
(~ulp(x·10^k)/10^-k per cast): Spark converts the binary double exactly
then rounds HALF_UP, while a multiply-then-round path crosses grid
midpoints differently. For those, quantize with
``floor(x * 10^k) AS BIGINT`` instead — floor of an identical IEEE
product is identical in every engine — then sum the integer units and
do all later arithmetic on identical doubles in identical op order
(see s55_embedding_outliers for the full pattern).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(c: Column | str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DEC)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent avg: exact decimal sum / count, double division."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


# DuckDB-side SQL templates matching dsum/davg. Usage:
#   SUM_D.format("l_quantity")  ->  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
SUM_D = "CAST(SUM(CAST({} AS DECIMAL(38,6))) AS DOUBLE)"

# Floor-half-up-on-the-double-product quantization to 1e-6 units — the
# engine-agnostic twin of the stateful operators' numpy accumulation
# (floor(v*1e6 + 0.5) is the same IEEE multiply/add/floor everywhere,
# immune to the decimal-cast disagreement documented above).
MICRO_SUM = "(CAST(SUM(CAST(floor({} * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)"
AVG_D = "(CAST(SUM(CAST({} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({}))"
