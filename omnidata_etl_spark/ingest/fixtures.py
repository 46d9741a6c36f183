"""Deterministic ingestion fixtures (FIXTURES.md §B).

One logical schema across formats so results are comparable:
``people(person_id, full_name, balance, signup_ts, active, notes)`` —
covering every type family of the reference's mapping table
(/root/reference backend/index.js:35-59). Files are materialized lazily into
a process-stable temp directory; content is embedded so fixtures never
drift from tests.
"""

from __future__ import annotations

import os
import tempfile

_ROWS = [
    ("1", "Ada Lovelace", "100.50", "2024-01-01 10:00:00", "true", "pioneer"),
    ("2", "Grace Hopper", "250.75", "2024-02-15 09:30:00", "true", "compiler"),
    ("3", "Alan Turing", "0.00", "2024-03-20 14:45:00", "false", "enigma"),
    ("4", "Edsger Dijkstra", "42.42", "2024-04-04 08:15:00", "true", "paths"),
    ("5", "Barbara Liskov", "777.77", "2024-05-30 16:20:00", "true", "types"),
    ("6", "John von Neumann", "1024.00", "2024-06-06 12:00:00", "false", "arch"),
]
_HEADERS = ("person_id", "full_name", "balance", "signup_ts", "active", "notes")


def _csv(sep: str) -> str:
    lines = [sep.join(_HEADERS)]
    lines += [sep.join(r) for r in _ROWS]
    return "\n".join(lines) + "\n"


def _markdown() -> str:
    lines = ["| " + " | ".join(_HEADERS) + " |"]
    lines.append("|" + "|".join("---" for _ in _HEADERS) + "|")
    lines += ["| " + " | ".join(r) + " |" for r in _ROWS]
    return "\n".join(lines) + "\n"


def _quoted_csv() -> str:
    lines = [",".join(_HEADERS)]
    lines += [",".join(f'"{v}"' for v in r) for r in _ROWS]
    return "\n".join(lines) + "\n"


def _sparse_csv() -> str:
    # empty cells + short rows (fewer cells than headers) → nulls (R10)
    return (
        ",".join(_HEADERS)
        + "\n"
        + "1,Ada Lovelace,,2024-01-01 10:00:00,true,\n"
        + "2,,250.75\n"
        + "3,Alan Turing,0.00,,false,enigma\n"
    )


def _blanklines_csv() -> str:
    body = _csv(",").splitlines()
    out = [body[0], "", body[1], body[2], "", "", body[3], body[4], body[5], body[6], ""]
    return "\n".join(out) + "\n"


def _jsonl() -> str:
    import json

    lines = []
    for i, r in enumerate(_ROWS):
        obj = {
            "person_id": int(r[0]),
            "full_name": r[1],
            "balance": float(r[2]),
            "signup_ts": r[3],
            "active": r[4] == "true",
            # one row carries a nested object (reference stringifies it, R11)
            "notes": {"tag": r[5], "idx": i} if i == 0 else r[5],
        }
        lines.append(json.dumps(obj, sort_keys=True))
    return "\n".join(lines) + "\n"


def _xml() -> str:
    from xml.sax.saxutils import escape

    rows = []
    for r in _ROWS:
        cells = "".join(
            f"<{h}>{escape(v)}</{h}>" for h, v in zip(_HEADERS, r)
        )
        rows.append(f"  <row>{cells}</row>")
    return "<people>\n" + "\n".join(rows) + "\n</people>\n"


def _withid_csv() -> str:
    headers = ("ID",) + _HEADERS[1:]
    lines = [",".join(headers)]
    lines += [",".join(r) for r in _ROWS]
    return "\n".join(lines) + "\n"


def _badtypes_csv() -> str:
    return (
        ",".join(_HEADERS)
        + "\n1,Ada,100.50,2024-01-01 10:00:00,true,x"
        + "\n2,Bob,abc,2024-01-02 10:00:00,true,y"
        + "\n3,Cid,7.25,2024-01-03 10:00:00,false,z\n"
    )


FIXTURES: dict[str, str] = {
    "people_comma.csv": _csv(","),
    "people_tab.tsv": _csv("\t"),
    "people_pipe.md": _markdown(),
    "people_quoted.csv": _quoted_csv(),
    "people_sparse.csv": _sparse_csv(),
    "people_blanklines.csv": _blanklines_csv(),
    "people.jsonl": _jsonl(),
    "people.xml": _xml(),
    "people_noid.csv": _csv(","),  # no `id` column → surrogate key injected
    "people_withid.csv": _withid_csv(),  # has ID → no injection (R12)
    "people_badtypes.csv": _badtypes_csv(),
}

N_PEOPLE = len(_ROWS)
PEOPLE_HEADERS = _HEADERS


def fixture_dir() -> str:
    d = os.path.join(tempfile.gettempdir(), "omnidata_fixtures_v1")
    os.makedirs(d, exist_ok=True)
    return d


def fixture_path(name: str) -> str:
    """Materialize (once) and return the path of a named fixture file.

    Staleness-proof (r9 ADVICE): an existing file is re-read and compared
    to the embedded content — if the fixture text changed across versions,
    the shared temp-dir copy from a prior run is rewritten instead of
    silently served to BOTH Spark and the DuckDB oracle (the differential
    cannot catch drift when the two sides read the same stale bytes).
    Fixtures are a few hundred bytes, so the compare is one cheap read."""
    if name not in FIXTURES:
        raise KeyError(f"unknown fixture {name!r}")
    path = os.path.join(fixture_dir(), name)
    want = FIXTURES[name]
    try:
        with open(path, "r", encoding="utf-8") as f:
            if f.read() == want:
                return path
    except OSError:
        pass
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(want)
    os.replace(tmp, path)
    return path


def fixture_gz_path(name: str) -> str:
    """Materialize (once) `<name>.gz` at a deterministic path — byte-stable
    (gzip mtime pinned to 0) so both the Spark reader and a DuckDB oracle
    can reference the same compressed file (r8: promotes ingest_csv_gzip
    from rows-only to oracle-checked). Regenerated whenever the source
    fixture's decompressed bytes differ from the embedded content (r9
    ADVICE: a stale .gz from a prior run would otherwise outlive a fixture
    edit — fixture_path already rewrote the source by content-compare, and
    the same compare gates the compressed copy)."""
    import gzip

    src = fixture_path(name)
    path = src + ".gz"
    want = FIXTURES[name].encode("utf-8")
    try:
        with gzip.open(path, "rb") as f:
            if f.read() == want:
                return path
    # EOFError/BadGzipFile: a truncated/corrupt .gz left by an interrupted
    # prior run must trigger the rewrite, not escape (r9 ADVICE)
    except (OSError, EOFError):
        pass
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as fout:
            fout.write(want)
    os.replace(tmp, path)
    return path
