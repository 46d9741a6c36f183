"""`omnidata_text`: a Python DataSource (Spark 4 API) wrapping the
reference's sniffing text scan as a first-class connector.

SURVEY.md §4 lists "a v2 DataSource wrapping 'sniffing CSV' so
delimiter/`---` handling is pushed into the scan" as the one candidate for
custom source work. This is that source, built on the public
`pyspark.sql.datasource` API: delimiter sniffing (tab > pipe > comma,
/root/reference backend/index.js:107-109), markdown `---`-row skip and edge
pipe stripping (:111,:114,:221), cell trim + empty→NULL (:115,:117,:223) all
happen inside the partition reader, so the cleaned table is what Spark sees.

Usage::

    register_text_source(spark)
    df = spark.read.format("omnidata_text").load(path)

Partitioning: one input file = one partition (files are line-oriented with a
header; splitting a file would need byte-range + header re-sync like Spark's
CSV source — a documented future step). A directory of files fans out across
executors, which is the 100 TB layout anyway.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StringType, StructField, StructType


def _sniff(first_line: str) -> str:
    if "\t" in first_line:
        return "\t"
    if "|" in first_line:
        return "|"
    return ","


def _clean_cell(cell: str) -> str | None:
    c = cell.strip()
    if c.startswith('"') and c.endswith('"') and len(c) >= 2:
        c = c[1:-1].strip()
    return c if c != "" else None


def _is_separator_row(line: str) -> bool:
    s = line.strip().strip("|").strip()
    return bool(s) and all(ch in "-:| " for ch in s) and "-" in s


def _parse_line(line: str, sep: str) -> list[str]:
    if sep == "|":
        line = line.strip()
        if line.startswith("|"):
            line = line[1:]
        if line.endswith("|"):
            line = line[:-1]
    return line.split(sep)


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
    return [path]


def _header_of(path: str) -> tuple[list[str], str]:
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                sep = _sniff(line)
                cells = [_clean_cell(c) or "" for c in _parse_line(line.rstrip("\n"), sep)]
                return cells, sep
    return [], ","


def _file_rows(path: str, n_cols: int):
    """Parsed data rows of one file (header skipped, cells cleaned/padded)."""
    header, sep = _header_of(path)
    skipped_header = False
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.rstrip("\n")
            if not line.strip():
                continue  # blank-line skip (backend/index.js:212)
            if _is_separator_row(line):
                continue  # markdown `---` row (backend/index.js:114)
            if not skipped_header:
                skipped_header = True
                continue
            cells = [_clean_cell(c) for c in _parse_line(line, sep)]
            # pad short rows with NULLs (save-path behavior, :223)
            cells += [None] * (n_cols - len(cells))
            yield tuple(cells[:n_cols])


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _TextReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in _list_files(self.path)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        yield from _file_rows(partition.path, len(self.schema.fields))


@dataclass
class _TextCommit(WriterCommitMessage):
    """Per-partition commit message: staged name → final name (None for an
    empty partition that wrote nothing)."""

    tmp_name: str | None
    final_name: str | None


class _TextWriter(DataSourceWriter):
    """Batch write path: each partition streams its rows into one
    dot-prefixed staged segment (invisible to `_list_files`, so concurrent
    readers never see a half-written file), and the driver-side commit
    renames every staged segment into place — the same stage-then-rename
    atomicity as the engine's parquet sink (ingest/load.py). `overwrite`
    removes the pre-existing segments recorded at plan time, AFTER the new
    ones land.

    Format parity with the reader (and the reference's parser): tab
    delimiter (sniffed first, /root/reference backend/index.js:107), one
    header line per segment, NULL ↔ empty cell (:223). The reference's
    parser has no quoting, so a value containing a tab or newline RAISES
    rather than silently corrupting the table. Local/shared-filesystem
    writer by design — executors and the committing driver must see one
    namespace (the reference's uploads are likewise local disk,
    backend/index.js:17-30); an object-store deployment swaps this class
    for a committer-protocol sink.
    """

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("omnidata_text requires a path")
        self.cols = [f.name for f in schema.fields]
        self.overwrite = overwrite
        self.existing = (
            [os.path.basename(p) for p in _list_files(self.path)]
            if os.path.isdir(self.path)
            else []
        )

    def write(self, iterator: Iterator) -> _TextCommit:
        os.makedirs(self.path, exist_ok=True)
        uid = uuid.uuid4().hex
        tmp = f".part-{uid}.tsv.inprogress"
        n = 0
        with open(os.path.join(self.path, tmp), "w", encoding="utf-8") as f:
            f.write("\t".join(self.cols) + "\n")
            for row in iterator:
                cells = []
                for i in range(len(self.cols)):
                    v = row[i]
                    s = "" if v is None else str(v)
                    if "\t" in s or "\n" in s:
                        raise ValueError(
                            "omnidata_text cannot represent tab/newline in a "
                            f"cell (column {self.cols[i]!r}); the format has "
                            "no quoting (reference parser parity)"
                        )
                    cells.append(s)
                f.write("\t".join(cells) + "\n")
                n += 1
        if n == 0:
            os.remove(os.path.join(self.path, tmp))
            return _TextCommit(None, None)
        return _TextCommit(tmp, f"part-{uid}.tsv")

    def commit(self, messages) -> None:
        for m in messages:
            if m is not None and m.tmp_name:
                os.rename(
                    os.path.join(self.path, m.tmp_name),
                    os.path.join(self.path, m.final_name),
                )
        if self.overwrite:
            for name in self.existing:
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.tmp_name:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass


class OmnidataTextDataSource(DataSource):
    """format("omnidata_text") — sniffing text/markdown scan as a source,
    stage-and-rename delimited-text writer as a sink."""

    @classmethod
    def name(cls) -> str:
        return "omnidata_text"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("omnidata_text requires a path")
        first = _list_files(path)
        header, _ = _header_of(first[0]) if first else ([], ",")
        # text-by-default: every column is a string (backend/index.js:36);
        # types are applied by the user-directed mapping (ingest.load)
        return StructType([StructField(h, StringType(), True) for h in header])

    def reader(self, schema: StructType) -> DataSourceReader:
        return _TextReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _TextWriter(schema, dict(self.options), overwrite)

    def simpleStreamReader(self, schema: StructType):
        return _TextSimpleStreamReader(schema, dict(self.options))


class _TextSimpleStreamReader(SimpleDataSourceStreamReader):
    """Tail-follow streaming over a directory of text/markdown segments.

    `spark.readStream.format("omnidata_text")` turns the sniffing scan into
    a micro-batch source: the offset is the count of (lexically sorted)
    segment files already consumed, so each batch picks up exactly the
    files appended since the last one — the log-segment convention
    (part-00001, part-00002, …: appends sort after existing names; an
    out-of-order name would be silently attributed to an earlier offset
    range on replay, so the convention is load-bearing and documented).
    Offsets are tiny JSON dicts regardless of history length; replay for
    exactly-once recovery is a pure function of (start, end) file indices
    (`readBetweenOffsets`), which is what makes the source restartable
    from a checkpoint."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("omnidata_text requires a path")

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        # The end offset is pinned from the file listing FIRST so rows and
        # offset stay consistent if more segments land mid-call. The rows
        # MUST be a materialized (picklable) sequence, not a generator:
        # Spark pickles read()'s result to ship it to executors during
        # planPartitions (observed: "TypeError: cannot pickle 'generator'
        # object" from MicroBatchExecution) — driver-side materialization
        # is inherent to the Simple reader API; a source that must stream
        # executor-side implements DataSourceStreamReader partitions
        # instead.
        files = _list_files(self.path)
        end = {"idx": len(files)}
        rows = [
            r
            for p in files[start["idx"]:]
            for r in _file_rows(p, len(self.schema.fields))
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_files(self.path)[start["idx"]:end["idx"]]
        return iter(
            r for p in files for r in _file_rows(p, len(self.schema.fields))
        )


def register_text_source(spark) -> None:
    spark.dataSource.register(OmnidataTextDataSource)
