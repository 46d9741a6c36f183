"""Ingestion API — the reference's capability surface, Spark-first.

The reference's pipeline (SURVEY.md §3): upload → format-specific parse →
10-row preview → column projection → user-directed type mapping → CREATE
TABLE → batched transactional INSERT. Here that becomes: path →
``read_any`` (format dispatch + delimiter sniffing) → ``preview`` (limit
pushdown) → ``load`` (projection, ANSI casts, surrogate key, save modes,
atomic sink).
"""

from omnidata_etl_spark.ingest.preview import preview  # noqa: F401
from omnidata_etl_spark.ingest.readers import read_any, sniff_delimiter  # noqa: F401
from omnidata_etl_spark.ingest.types import map_user_type  # noqa: F401
from omnidata_etl_spark.ingest.load import (  # noqa: F401
    TableExistsError,
    load,
    sanitize_identifier,
)
