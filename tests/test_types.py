"""Type-mapping table tests (SURVEY.md §1.3) including the two quirk fixes."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from omnidata_etl_spark.ingest.types import map_user_type


@pytest.mark.parametrize(
    ("user", "expected"),
    [
        ("TEXT", T.StringType()),
        ("VARCHAR(30)", T.StringType()),
        ("CHAR(5)", T.StringType()),
        ("NVARCHAR", T.StringType()),
        ("INT", T.IntegerType()),
        ("INTEGER", T.IntegerType()),
        ("SMALLINT", T.IntegerType()),
        ("BIGINT", T.LongType()),  # quirk fixed: reference lost it to INTEGER
        ("FLOAT", T.DoubleType()),
        ("DOUBLE", T.DoubleType()),
        ("REAL", T.DoubleType()),
        ("DECIMAL", T.DecimalType(18, 2)),  # UI default (App.jsx:18)
        ("DECIMAL(12,3)", T.DecimalType(12, 3)),
        ("NUMERIC(10)", T.DecimalType(10, 2)),
        ("MONEY", T.DecimalType(18, 2)),
        ("DATETIME", T.TimestampType()),
        ("TIMESTAMP", T.TimestampType()),
        ("DATE", T.DateType()),
        ("TIME", T.StringType()),  # documented: no native Spark TIME
        ("BIT", T.BooleanType()),
        ("BOOLEAN", T.BooleanType()),
        ("UUID", T.StringType()),
        ("JSONB", T.StringType()),
        ("BYTEA", T.BinaryType()),  # quirk fixed: backend dropped to TEXT
        ("GEOMETRY", T.StringType()),  # unknown → TEXT fallback
        ("", T.StringType()),
    ],
)
def test_type_mapping(user, expected):
    assert map_user_type(user) == expected


def test_case_insensitive():
    assert map_user_type("bigint") == T.LongType()
    assert map_user_type("  Decimal( 8 , 1 )  ") == T.DecimalType(8, 1)


def test_try_sum_overflow_nulls(spark):
    """The cents fast path's two overflow behaviors, side by side: ANSI
    sum(bigint) RAISES on int64 overflow (fail-safe, never silently
    wrong), try_sum returns NULL (non-aborting variant, agg_try_sum)."""
    import pytest
    from pyspark.sql import functions as F

    big = spark.createDataFrame(
        [(9_223_372_036_854_775_000,), (9_223_372_036_854_775_000,)], "v long"
    )
    assert big.agg(F.try_sum("v").alias("s")).collect()[0]["s"] is None
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        big.agg(F.sum("v")).collect()
