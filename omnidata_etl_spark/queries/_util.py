"""Determinism helpers shared by the declared queries.

Float hash-parity with DuckDB is the #1 risk (SURVEY.md §7.3). Rules applied
throughout:

  * Money aggregates: cast each row's expression to DECIMAL(18,2) *before*
    SUM. Decimal addition is exact, so the result is independent of Spark's
    (and DuckDB's) partition/summation order; a double SUM would not be.
    The final value is cast to DOUBLE on both sides (a decimal with scale 2
    converts to the same double bit pattern everywhere).
  * Averages: exact decimal SUM cast to double, divided by COUNT in double —
    identical double division on identical inputs on both engines. Never
    AVG(decimal) (Spark yields decimal(.,6), DuckDB yields double: different
    rounding points).
  * Raw column values (no arithmetic) pass through untouched — bit-identical
    in parquet on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from omnidata_etl_spark.session import default_parallelism

DEC = "decimal(18,2)"


def spread(df: DataFrame) -> DataFrame:
    """Fan a too-narrow scan out to all cores before CPU-heavy per-row work.

    The local testdata tables are single-file / single-row-group parquet, so
    a scan yields ONE input partition and expression-heavy map stages
    (shingle hashing, per-token explodes) run on one core of 32 (measured:
    text_decontaminate 1.95s → 0.9s at sf0.1 with this). The round-robin
    repartition moves the small input bytes once and buys full parallelism
    for the expensive stage. Conditional on observed scan parallelism: on a
    real multi-file corpus the scan is already wide and this is a no-op plan
    (no shuffle inserted) — AQE cannot do this adaptively because it only
    coalesces shuffle outputs, never splits a too-coarse scan, and a
    single-row-group file is unsplittable by maxPartitionBytes.
    """
    target = default_parallelism()
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def dec2(col: str | Column) -> Column:
    """Exact decimal view of a 2dp-generated money column.

    Only ever applied to RAW columns whose generated values are exact 2dp
    decimals (l_extendedprice, l_discount, o_totalprice, events.value, ...):
    for those the nearest-double is within 1e-13 of the true decimal, so both
    engines land on the same DECIMAL regardless of their double→decimal
    rounding mode. Never cast a *computed* double to decimal — the two
    engines disagree on half-cent boundaries (observed on sum_disc_price).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(expr: Column) -> Column:
    """Order-independent money sum: SUM(CAST(expr AS DECIMAL(18,2)))::DOUBLE.

    Safe only when `expr` is a raw 2dp column (see dec2). For derived money
    expressions, build the expression from dec2() inputs so the arithmetic
    itself is decimal, then F.sum(...).cast('double') directly.
    """
    return F.sum(expr.cast(DEC)).cast("double")


def davg(expr: Column, count: Column | None = None) -> Column:
    """Deterministic average of a money expression (see module doc).

    Unrounded: exact decimal SUM → double ÷ COUNT is bit-identical across
    engines, while ROUND(double, n) is not (Spark rounds the shortest decimal
    repr, DuckDB the exact binary)."""
    n = count if count is not None else F.count(expr)
    return F.sum(expr.cast(DEC)).cast("double") / n
