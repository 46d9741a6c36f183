"""User-directed type mapping (reference R7).

Re-expresses the reference's translation table `mapToPostgresType`
(/root/reference backend/index.js:35-59; user vocabulary
frontend/src/App.jsx:5-32) onto Spark types, fixing two documented quirks
(SURVEY.md §1.3):

  * BIGINT was lossily mapped to INTEGER (backend/index.js:44) → LongType;
  * BYTEA was offered by the frontend (App.jsx:30) but unmapped in the
    backend, falling through to TEXT (backend/index.js:58) → BinaryType.

Casting is strict (ANSI mode): a bad value fails the load, matching the
reference's insert-time coercion + ROLLBACK (backend/index.js:240).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_DECIMAL_RE = re.compile(
    r"^(?:DECIMAL|NUMERIC)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?$", re.I
)


def map_user_type(user_type: str) -> T.DataType:
    """Map a free-text SQL type to a Spark type (reference quirks fixed)."""
    t = (user_type or "").strip().upper()
    base = re.sub(r"\(.*\)$", "", t).strip()

    if base in ("TEXT", "VARCHAR", "CHAR", "NVARCHAR", "CHARACTER VARYING"):
        # length limits discarded, like the reference (backend/index.js:41)
        return T.StringType()
    if base in ("INT", "INTEGER", "SMALLINT"):
        return T.IntegerType()
    if base == "BIGINT":
        return T.LongType()  # quirk fixed: was INTEGER in the reference
    if base in ("FLOAT", "DOUBLE", "REAL", "DOUBLE PRECISION"):
        return T.DoubleType()
    m = _DECIMAL_RE.match(t)
    if m:
        precision = int(m.group(1)) if m.group(1) else 18
        scale = int(m.group(2)) if m.group(2) else 2
        # (18,2) default mirrors the reference UI (frontend/src/App.jsx:18)
        return T.DecimalType(precision, scale)
    if base == "MONEY":
        return T.DecimalType(18, 2)
    if base in ("DATETIME", "TIMESTAMP"):
        return T.TimestampType()
    if base == "DATE":
        return T.DateType()
    if base == "TIME":
        # no native Spark TIME: carried as text (documented choice,
        # SURVEY.md §1.3)
        return T.StringType()
    if base in ("BIT", "BOOLEAN", "BOOL"):
        return T.BooleanType()
    if base == "UUID":
        return T.StringType()
    if base in ("JSONB", "JSON"):
        return T.StringType()  # JSON rides as string + from_json accessors
    if base == "BYTEA":
        return T.BinaryType()  # quirk fixed: backend lost it to TEXT
    return T.StringType()  # reference fallback (backend/index.js:58)
