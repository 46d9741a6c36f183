"""Custom Spark data sources (Python DataSource API, Spark 4)."""

from omnidata_etl_spark.sources.text_source import (  # noqa: F401
    OmnidataTextDataSource,
    register_text_source,
)
