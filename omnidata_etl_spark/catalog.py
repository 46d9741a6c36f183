"""Test-table catalog: the driver's parquet star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events documents
embeddings — one parquet per table under an ``sf_dir``. Parquet scans get
predicate pushdown / column pruning / vectorized reads from Catalyst for free
(SURVEY.md §4).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from omnidata_etl_spark.session import default_parallelism, ensure_tuned

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _size_shuffle_partitions(spark: SparkSession, sf_dir: str) -> None:
    """Size `spark.sql.shuffle.partitions` from the catalog's input stats.

    Plan-time analog of AQE coalescing: the right reducer count is a
    function of the data — `total on-disk bytes × fileCompressionFactor ÷
    64 MB advisory` — floored at the core count (a CPU-heavy shuffle stage
    with fewer tasks than cores starves: measured +100-500ms on the
    hash-heavy dedup/text queries with an 8-partition floor on 32 cores,
    while the small-aggregate "win" of fewer tasks was a warm-up artifact
    that disappears at steady state) and capped at 2000. At bench scale
    this resolves to the core count; at cluster scale the byte term yields
    thousands, and AQE still coalesces/splits per-stage at runtime. Runs
    once per (session, sf_dir): a deliberate later override by the user
    would be clobbered on the next table() call otherwise.
    """
    key = getattr(spark, "_omnidata_sized_for", None)
    if key == sf_dir:
        return
    spark._omnidata_sized_for = sf_dir
    try:
        total = 0
        for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
            if os.path.isdir(f):  # directory-style parquet (multi-part)
                for root, _, files in os.walk(f):
                    total += sum(
                        os.path.getsize(os.path.join(root, p)) for p in files
                    )
            else:
                total += os.path.getsize(f)
        est = total * 3  # uncompressed estimate, mirrors fileCompressionFactor
        n = max(default_parallelism(), min(2000, est // (64 << 20)))
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    except Exception:  # pragma: no cover - stats are an optimization only
        pass


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table; also ensures engine conf on the session.

    events.ts arrives in whatever physical type the generator used: nanosecond
    parquet is illegal as a Spark timestamp, so it is read as a nanos long
    (`nanosAsLong`) and truncated to a µs timestamp here (integer `div`, never
    float division: ns epochs exceed 2^53); µs parquet arrives as
    TIMESTAMP_NTZ and is normalized to session-time TIMESTAMP (a value-level
    no-op under the engine's pinned UTC session zone) so downstream epoch
    arithmetic (`cast(ts as double)`) stays legal under ANSI.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_tuned(spark)
    _size_shuffle_partitions(spark, sf_dir)
    # DataFrame *handles* (logical plans, not data) cached on the session
    # object itself, so the cache's lifetime IS the session's. (A
    # module-global WeakKeyDictionary cannot work here: each cached
    # DataFrame strongly references its session via df._session, pinning
    # the weak key forever; and an id()-keyed dict could alias a recycled
    # address to a dead session's plans.)
    per_session = getattr(spark, "_omnidata_handle_cache", None)
    if per_session is None:
        per_session = {}
        spark._omnidata_handle_cache = per_session
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view (for SQL-form queries)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
