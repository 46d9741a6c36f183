"""The `load` verb: projection → typed cast → surrogate key → atomic sink.

Mirrors the reference's save flow (SURVEY.md §3.2): column selection
(backend/index.js:167,:223), type mapping (:167-171), smart-id injection
(:174-182), exists-check → error (:153-160), transactional batched insert
(:186-236,:249-273).

Atomicity: Spark has no cross-partition transaction (SURVEY.md §7.3 #3), so
the sink stages the whole write into a hidden directory and atomically
renames it into place — all-or-nothing like the reference's single
BEGIN/COMMIT, with the semantic difference documented here: concurrent
readers see old-or-new, never partial; concurrent *writers* are not
serialized by the engine.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from omnidata_etl_spark.ingest.types import map_user_type


class TableExistsError(RuntimeError):
    """Target exists and mode='error' (reference HTTP 409, R13)."""


def sanitize_identifier(name: str) -> str:
    """Strip [^a-zA-Z0-9_] and lowercase (backend/index.js:146)."""
    return re.sub(r"[^a-zA-Z0-9_]", "", name or "").lower()


def normalize_empty_to_null(df: DataFrame) -> DataFrame:
    """Empty string → NULL on typed load (R10: the save path's behavior)."""
    from pyspark.sql import types as T

    return df.select(
        *[
            F.when(F.col(c) == "", None).otherwise(F.col(c)).alias(c)
            if isinstance(field.dataType, T.StringType)
            else F.col(c)
            for c, field in zip(df.columns, df.schema.fields)
        ]
    )


def has_id_column(df: DataFrame) -> bool:
    return any(c.lower() == "id" for c in df.columns)


def add_surrogate_key(
    df: DataFrame,
    order_by: list[str] | None = None,
    as_long: bool = False,
) -> DataFrame:
    """Inject a dense 1..N `id` iff no case-insensitive `id` exists (R12,
    reference `backend/index.js:174-182` — `id SERIAL` when absent).

    Two-phase distributed row_number, NOT a global `Window.orderBy` (that
    form moves every row to one partition — the single-node sort is the
    100 TB anti-pattern WindowExec itself warns about):

    1. range-partition on the ordering key (global order ACROSS partitions
       is preserved; partition i's keys all sort before partition i+1's),
    2. `row_number` within each partition (parallel local sorts),
    3. add per-partition row-count offsets — one row per partition,
       broadcast.

    For a unique ordering key the result is identical to the global window
    regardless of where the range boundaries fall (a row's number is its
    position in the total order). Ties that straddle a boundary get an
    arbitrary-but-dense assignment — the same nondeterminism any ORDER BY
    with ties has. Defaults to ordering by all columns, stable for
    deduplicated loads. `id` stays int for reference `SERIAL` parity; past
    INT_MAX the projection raises an explicit error (never wraps) — a
    >2.1B-row load opts into BIGSERIAL semantics (long ids) upstream.
    `as_long=True` IS that BIGSERIAL opt-in: long ids, no INT_MAX guard
    (for consumers whose row space legitimately exceeds 2.1B, e.g.
    etl_global_shuffle positions at corpus scale).
    """
    if has_id_column(df):
        return df
    order_cols = order_by or df.columns
    ocols = [F.col(c) for c in order_cols]
    from omnidata_etl_spark.session import default_parallelism

    # Local row number WITHOUT a Window: a Window.partitionBy(pid) would
    # demand hashpartitioning(pid) — a second full-data shuffle Catalyst
    # can't elide even though each partition already holds exactly one pid.
    # monotonically_increasing_id() is documented (its API doc + source) as
    # partition id in the upper bits and the consecutive-from-0 record
    # number within the partition in the low 33 bits; masked, it IS the
    # local row number over the sorted stream (the id is nondeterministic-
    # tagged, so Catalyst never reorders it across the sort below it).
    numbered = (
        df.repartitionByRange(default_parallelism(), *ocols)
        .sortWithinPartitions(*ocols)
        .withColumn("_sk_pid", F.spark_partition_id())
        .withColumn(
            "_sk_rn",
            F.monotonically_increasing_id().bitwiseAND(
                F.lit((1 << 33) - 1)
            )
            + 1,
        )
        .persist()  # two consumers below; ReusedExchange cannot dedupe a
        # broadcast-side subtree, so without the cache the offsets branch
        # would re-run the range shuffle. load() unpersists after its sink
        # write; other callers inherit the session-scoped cache lifetime.
    )
    # Per-partition offsets: #partitions rows — the single-partition
    # prefix-sum window over them is trivial at any scale (partition
    # count, not row count).
    offsets = (
        numbered.groupBy("_sk_pid")
        .agg(F.count(F.lit(1)).alias("_sk_n"))
        .withColumn(
            "_sk_off",
            F.coalesce(
                F.sum("_sk_n").over(
                    Window.orderBy("_sk_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("long"),
            ),
        )
        .select("_sk_pid", "_sk_off")
    )
    id_expr = (
        (F.col("_sk_rn") + F.col("_sk_off")).alias("id")
        if as_long
        else F.expr(
            "CASE WHEN _sk_rn + _sk_off > 2147483647 THEN "
            "raise_error('surrogate_key: row number exceeds INT_MAX "
            "(SERIAL parity); use BIGSERIAL semantics upstream for "
            ">2.1B-row loads') "
            "ELSE cast(_sk_rn + _sk_off AS INT) END"
        ).alias("id")
    )
    out = (
        numbered.join(F.broadcast(offsets), "_sk_pid")
        # id arithmetic stays in LONG; the default int cast is guarded with
        # an explicit, actionable error: a >2^31-row load must not wrap (or
        # die in an opaque ANSI overflow) — SERIAL parity caps at INT_MAX
        # by design, and bigger loads opt into BIGSERIAL via as_long
        # (r5 ADVICE on the silent-wrap hazard).
        .withColumn("id", id_expr)
        .drop("_sk_pid", "_sk_rn", "_sk_off")
    )
    out._sk_cache = numbered  # handle for load()'s post-write unpersist
    return out


def apply_types(df: DataFrame, types: dict[str, str] | None) -> DataFrame:
    """ANSI (strict) casts from user-declared SQL type strings (R7)."""
    if not types:
        return df
    cols = []
    for c in df.columns:
        if c in types:
            cols.append(F.col(c).cast(map_user_type(types[c])).alias(c))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def load(
    df: DataFrame,
    table_name: str,
    *,
    warehouse: str,
    columns: list[str] | None = None,
    types: dict[str, str] | None = None,
    mode: str = "error",
    surrogate_key: bool = True,
    order_by: list[str] | None = None,
) -> str:
    """Project → normalize → cast → key → atomically sink as parquet.

    Returns the final table path. mode: 'error' (reference default, R13) or
    'overwrite'. The staged write + rename gives reference-style
    all-or-nothing loads (R15).
    """
    name = sanitize_identifier(table_name)
    if not name:
        raise ValueError("table name sanitized to empty string")
    target = os.path.join(warehouse, name)
    if os.path.exists(target) and mode == "error":
        raise TableExistsError(f"table {name!r} already exists")

    out = df.select(*columns) if columns else df
    out = normalize_empty_to_null(out)
    out = apply_types(out, types)
    if surrogate_key:
        out = add_surrogate_key(out, order_by)

    staging = os.path.join(warehouse, f".{name}.staging-{uuid.uuid4().hex}")
    try:
        out.write.mode("overwrite").parquet(staging)  # executes the plan
    finally:
        cache = getattr(out, "_sk_cache", None)
        if cache is not None:  # surrogate-key scratch frame: one-shot here
            cache.unpersist()
    if os.path.exists(target):
        if mode == "error":  # re-check: lost race
            shutil.rmtree(staging, ignore_errors=True)
            raise TableExistsError(f"table {name!r} already exists")
        old = target + f".old-{uuid.uuid4().hex}"
        os.rename(target, old)
        os.rename(staging, target)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(staging, target)
    return target


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "error",
    batchsize: int = 1000,
    **options: str,
) -> None:
    """JDBC sink with the reference's batch size (1000-row INSERT batches,
    backend/index.js:188,:226). Per-partition transactions only — true
    cross-partition atomicity needs the staging pattern of :func:`load`.
    Extra ``options`` pass through to the JDBC writer (e.g. ``driver`` for
    drivers not registered with java.sql.DriverManager's service loader —
    exercised live in tests/test_jdbc.py)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
