"""Scan / source / sink queries (SURVEY.md §2B "Scans / sources / sinks").

Reference provenance: the reference's scans are streamed format-specific file
parses (CSV/TSV/pipe-markdown at /root/reference backend/index.js:98-119 and
:206-232, Excel at :93-96, Access at :62-80); its sink is CREATE TABLE +
batched INSERT with errorifexists semantics (backend/index.js:153-184,
:249-273). Here each becomes a declarative Spark reader (Catalyst pushes
limits/projections into the scan) or a save-mode behavior check.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from omnidata_etl_spark.catalog import table
from omnidata_etl_spark.ingest.fixtures import fixture_path
from omnidata_etl_spark.ingest.readers import read_any
from omnidata_etl_spark.registry import query


@query("scan_parquet", oracle="SELECT * FROM nation", tags=("scan",))
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan of `nation` (generalizes reference R1-R4 "scan")."""
    return table(spark, sf_dir, "nation")


@query("ingest_csv", tags=("scan", "ingest"))
def ingest_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comma-CSV ingest with header inference + delimiter sniffing (R1).

    Reference: default-delimiter path /root/reference backend/index.js:109,
    header from line 1 at :111. Rows-only check (fixture, not in sf_dir).
    """
    return read_any(spark, fixture_path("people_comma.csv"))


@query("ingest_tsv", tags=("scan", "ingest"))
def ingest_tsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tab-separated ingest; tab sniffing takes precedence (R1).

    Reference: /root/reference backend/index.js:107-108.
    """
    return read_any(spark, fixture_path("people_tab.tsv"))


@query("ingest_pipe_markdown", tags=("scan", "ingest"))
def ingest_pipe_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GitHub markdown table ingest: `---` row skipped, pipes stripped (R2).

    Reference: pipe sniffing backend/index.js:109, `---` skip :114/:219,
    pipe strip :111/:221.
    """
    return read_any(spark, fixture_path("people_pipe.md"))


@query("ingest_json", tags=("scan", "ingest"))
def ingest_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited JSON ingest — fixes the reference's accept/parse gap
    (frontend/src/App.jsx:172 accepts .json; backend/index.js:97 has no JSON
    branch, so JSON parsed as delimiter-text garbage)."""
    return read_any(spark, fixture_path("people.jsonl"))


@query("sink_errorifexists", tags=("sink",))
def sink_errorifexists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Save-mode `error` semantics: second write to the same target fails.

    Reference R13: `to_regclass` exists-probe → HTTP 409
    (/root/reference backend/index.js:153-160). Behavioral; rows-only.
    """
    df = table(spark, sf_dir, "region")
    target = tempfile.mkdtemp(prefix="omnidata_sink_") + "/region_tbl"
    outcomes = []
    df.write.mode("error").parquet(target)
    outcomes.append(("first_write", "ok"))
    try:
        df.write.mode("error").parquet(target)
        outcomes.append(("second_write", "ok"))
    except Exception:
        outcomes.append(("second_write", "errorifexists"))
    return spark.createDataFrame(outcomes, "step string, outcome string")
