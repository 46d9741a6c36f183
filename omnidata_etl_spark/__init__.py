"""omnidata-etl-spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the ingestion/ETL capabilities of
the reference (`Rushda-Mujawar/omnidata-etl`, a Node/Express + PostgreSQL ETL
tool; see SURVEY.md) plus a relational analytics surface and LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Design stance (SURVEY.md §7.0):
  * DataFrame / SQL API only — no RDDs; Catalyst owns physical planning.
  * ANSI mode + UTC session timezone for strict-cast + oracle parity.
  * Built-in `pyspark.sql.functions` in every declared query (no Python UDFs
    on the hot path); Pandas UDFs only for genuinely non-expressible ops
    (multimodal decode plumbing).
  * Deterministic outputs: aliased columns, decimal-based money aggregates,
    explicit tiebreaks on every limit/top-k.
"""

from omnidata_etl_spark.session import ensure_tuned, get_session  # noqa: F401
from omnidata_etl_spark.catalog import TABLES, table  # noqa: F401

__version__ = "0.1.0"
