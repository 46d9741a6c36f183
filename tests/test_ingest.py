"""Ingestion-fixture tests (FIXTURES.md §B): every reference parse path.

Expected-result conventions from FIXTURES.md: identical (row_count,
header_list) across comma/tab/pipe/quoted after cleaning; nulls exactly where
cells were empty in people_sparse; people_badtypes raises; people_noid gains
a dense 1..N id, people_withid does not.
"""

from __future__ import annotations

import tempfile

import pytest

from omnidata_etl_spark.ingest import (
    TableExistsError,
    load,
    preview,
    read_any,
    sanitize_identifier,
    sniff_delimiter,
)
from omnidata_etl_spark.ingest.fixtures import (
    N_PEOPLE,
    PEOPLE_HEADERS,
    fixture_path,
)


def test_sniff_precedence():
    # tab > pipe > comma (/root/reference backend/index.js:107-109)
    assert sniff_delimiter("a\tb|c,d") == "\t"
    assert sniff_delimiter("a|b,c") == "|"
    assert sniff_delimiter("a,b") == ","


@pytest.mark.parametrize(
    "name",
    [
        "people_comma.csv",
        "people_tab.tsv",
        "people_pipe.md",
        "people_quoted.csv",
    ],
)
def test_formats_agree(spark, name):
    df = read_any(spark, fixture_path(name))
    assert tuple(df.columns) == PEOPLE_HEADERS
    rows = df.orderBy("person_id").collect()
    assert len(rows) == N_PEOPLE
    assert rows[0]["full_name"] == "Ada Lovelace"
    assert rows[0]["balance"] == "100.50"  # text-by-default (R7)


def test_blank_lines_skipped(spark):
    df = read_any(spark, fixture_path("people_blanklines.csv"))
    assert df.count() == N_PEOPLE


def test_sparse_nulls(spark):
    rows = (
        read_any(spark, fixture_path("people_sparse.csv"))
        .orderBy("person_id")
        .collect()
    )
    assert rows[0]["balance"] is None  # empty cell → NULL (R10)
    assert rows[0]["notes"] is None  # trailing empty → NULL
    assert rows[1]["signup_ts"] is None  # short row → NULL
    assert rows[1]["full_name"] is None
    assert rows[2]["signup_ts"] is None


def test_json_ingest_stringifies_nested(spark):
    df = read_any(spark, fixture_path("people.jsonl"))
    rows = df.orderBy("person_id").collect()
    assert len(rows) == N_PEOPLE
    # row 0's notes was a nested object → stringified (R11)
    assert rows[0]["notes"].startswith("{")
    assert "pioneer" in rows[0]["notes"]
    assert rows[1]["notes"] == "compiler"


def test_markdown_preview(spark):
    p = preview(spark, fixture_path("people_pipe.md"), n=3)
    assert p["headers"] == list(PEOPLE_HEADERS)
    assert len(p["preview"]) == 3
    assert p["preview"][0]["person_id"] == "1"


def test_excel_roundtrip(spark, tmp_path):
    """R3: first-sheet Excel read via the dependency-free xlsx reader
    (fixture workbook written by the same module's minimal writer)."""
    from omnidata_etl_spark.ingest.fixtures import _ROWS
    from omnidata_etl_spark.ingest.xlsx import write_xlsx

    path = str(tmp_path / "people.xlsx")
    rows = list(_ROWS)
    rows[2] = rows[2][:4] + ("", "")  # blank cells → NULL
    write_xlsx(path, list(PEOPLE_HEADERS), rows)
    df = read_any(spark, path)
    assert tuple(df.columns) == PEOPLE_HEADERS
    got = {r["person_id"]: r for r in df.collect()}
    assert len(got) == N_PEOPLE
    assert got["1"]["full_name"] == "Ada Lovelace"
    assert got["3"]["active"] is None  # blank cell → NULL (R10)
    assert got["3"]["notes"] is None


def test_sanitize_identifier():
    # strip [^a-zA-Z0-9_] + lowercase (backend/index.js:146)
    assert sanitize_identifier("My Table-2024!") == "mytable2024"


def test_surrogate_key_injection(spark):
    wh = tempfile.mkdtemp(prefix="omnidata_wh_")
    noid = read_any(spark, fixture_path("people_noid.csv"))
    t = load(noid, "noid", warehouse=wh)
    got = spark.read.parquet(t)
    assert "id" in got.columns
    assert sorted(r["id"] for r in got.collect()) == list(range(1, N_PEOPLE + 1))

    withid = read_any(spark, fixture_path("people_withid.csv"))
    t2 = load(withid, "withid", warehouse=wh)
    got2 = spark.read.parquet(t2)
    # case-insensitive `ID` present → no injection (backend/index.js:174-182)
    assert [c for c in got2.columns if c.lower() == "id"] == ["ID"]


def test_errorifexists(spark):
    wh = tempfile.mkdtemp(prefix="omnidata_wh_")
    df = read_any(spark, fixture_path("people_comma.csv"))
    load(df, "t", warehouse=wh)
    with pytest.raises(TableExistsError):
        load(df, "t", warehouse=wh)
    load(df, "t", warehouse=wh, mode="overwrite")  # overwrite allowed


def test_strict_cast_aborts_whole_load(spark):
    import os

    wh = tempfile.mkdtemp(prefix="omnidata_wh_")
    bad = read_any(spark, fixture_path("people_badtypes.csv"))
    with pytest.raises(Exception):
        load(bad, "bad", warehouse=wh, types={"balance": "DECIMAL(12,2)"})
    # atomic: nothing (not even a partial table) left behind (R15 semantics)
    assert not os.path.exists(os.path.join(wh, "bad"))


def test_typed_load_roundtrip(spark):
    from decimal import Decimal

    wh = tempfile.mkdtemp(prefix="omnidata_wh_")
    df = read_any(spark, fixture_path("people_comma.csv"))
    t = load(
        df,
        "typed",
        warehouse=wh,
        columns=["person_id", "full_name", "balance", "signup_ts", "active"],
        types={
            "person_id": "BIGINT",
            "balance": "DECIMAL(12,2)",
            "signup_ts": "TIMESTAMP",
            "active": "BOOLEAN",
        },
    )
    got = spark.read.parquet(t)
    dtypes = dict(got.dtypes)
    assert dtypes["person_id"] == "bigint"
    assert dtypes["balance"] == "decimal(12,2)"
    assert dtypes["signup_ts"] == "timestamp"
    assert dtypes["active"] == "boolean"
    row = got.orderBy("person_id").first()
    assert row["balance"] == Decimal("100.50")
    assert row["active"] is True


def test_gzip_jsonl_dispatches_to_json_reader(spark, tmp_path):
    """Codec suffixes are stripped before extension dispatch: a .jsonl.gz
    must reach the JSON reader (not be sniffed as delimiter text)."""
    import gzip

    from omnidata_etl_spark.ingest.fixtures import fixture_path
    from omnidata_etl_spark.ingest.readers import read_any

    src = fixture_path("people.jsonl")
    gz = str(tmp_path / "people.jsonl.gz")
    with open(src, "rb") as fin, gzip.open(gz, "wb") as fout:
        fout.write(fin.read())
    got = read_any(spark, gz)
    want = read_any(spark, src)
    assert sorted(got.columns) == sorted(want.columns)
    assert got.count() == want.count()


def test_xml_ingest_matches_csv_rows(spark):
    """Spark-4 native XML source: same logical people table as the CSV twin
    (XML infers types, so compare values loosely; schema order is the
    source's inference order, not file order)."""
    xml = read_any(spark, fixture_path("people.xml"))
    assert sorted(xml.columns) == sorted(PEOPLE_HEADERS)
    rows = {int(r["person_id"]): r for r in xml.collect()}
    assert len(rows) == N_PEOPLE
    ada = rows[1]
    assert ada["full_name"] == "Ada Lovelace"
    assert float(ada["balance"]) == 100.50
    assert ada["active"] in (True, "true")


def test_schema_evolution_merge(spark, sf_dir):
    """mergeSchema across two staged parquet generations: unified 4-column
    schema, rows from both, NULL backfill exactly on the old generation,
    id sum preserved — all proven by the op's own evolution_ok column."""
    from omnidata_etl_spark.registry import all_specs

    row = all_specs()["ingest_schema_evolution"].fn(spark, sf_dir).collect()[0]
    assert row["evolution_ok"] is True
    assert row["n_columns"] == 4
    assert row["n_backfilled"] * 2 == row["n_rows"]
