"""Dependency-free minimal legacy ``.xls`` (BIFF8) reader.

The reference accepts both ``.xls`` and ``.xlsx`` uploads and parses them
with the same sheet library (/root/reference backend/index.js:93-96;
``.xls`` in the accept list at frontend/src/App.jsx:172). This container
has no xlrd, so this module is a clean-room, spec-level implementation of
the two formats a legacy workbook stacks:

* the OLE2 / Compound File Binary container ([MS-CFB]): 512-byte FAT
  sectors, DIFAT, directory entries, and the mini-FAT/mini-stream that
  small streams (< 4096 bytes) live in;
* the BIFF8 record stream ([MS-XLS]) inside the ``Workbook`` directory
  stream: workbook globals (BOUNDSHEET, SST — including strings split
  across CONTINUE records with per-continuation flag bytes, [MS-XLS]
  2.5.293) followed by per-sheet cell substreams (LABELSST, LABEL,
  NUMBER, RK, MULRK, BOOLERR, FORMULA cached values).

Same output contract as ingest/xlsx.py: first sheet, rows of cell strings
with ``None`` for blanks; numbers render as their shortest decimal form
(integral doubles drop the ``.0``). Honest scope, mirrored from the codec
family: BIFF5 workbooks and encrypted workbooks (FILEPASS) raise
actionable errors instead of mis-parsing; formats/dates-as-serials are
out of scope like the xlsx reader's.

``write_xls`` emits a minimal spec-shaped BIFF8-in-CFB workbook for test
fixtures (the write_xlsx pattern), including an option to force an SST
CONTINUE split so the continuation path is pinned by tests.
"""

from __future__ import annotations

import struct

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_NOSTREAM = 0xFFFFFFFF

# BIFF8 record opcodes ([MS-XLS] 2.3)
_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_FILEPASS = 0x002F
_CODEPAGE = 0x0042


def _u16(b: bytes, off: int = 0) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int = 0) -> int:
    return struct.unpack_from("<I", b, off)[0]


# ---------------------------------------------------------------- CFB read


def _cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name is in ``names`` from a
    Compound File Binary blob ([MS-CFB] layout; v3 512-byte and v4
    4096-byte sectors both handled)."""
    if data[:8] != OLE_MAGIC:
        raise ValueError("not an OLE2 compound file")
    ssz = 1 << _u16(data, 30)
    msz = 1 << _u16(data, 32)
    num_fat = _u32(data, 44)
    dir_start = _u32(data, 48)
    mini_cutoff = _u32(data, 56)
    minifat_start = _u32(data, 60)
    difat_start = _u32(data, 68)
    num_difat = _u32(data, 72)

    def sector(i: int) -> bytes:
        off = (i + 1) * ssz
        return data[off : off + ssz]

    per = ssz // 4
    difat = list(struct.unpack_from("<109I", data, 76))
    s = difat_start
    for _ in range(num_difat):
        entries = struct.unpack(f"<{per}I", sector(s))
        difat += entries[:-1]
        s = entries[-1]
    fat: list[int] = []
    for fs in difat[:num_fat]:
        fat += struct.unpack(f"<{per}I", sector(fs))

    def chain(start: int, table: list[int]) -> list[int]:
        out: list[int] = []
        cur = start
        while cur < 0xFFFFFFFA:
            out.append(cur)
            if len(out) > len(table) + 1:
                raise ValueError("corrupt compound file: cyclic sector chain")
            cur = table[cur]
        return out

    dirdata = b"".join(sector(i) for i in chain(dir_start, fat))
    root = None
    target = None
    for off in range(0, len(dirdata), 128):
        e = dirdata[off : off + 128]
        if len(e) < 128:
            break
        nlen = _u16(e, 64)
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le", "replace")
        typ = e[66]
        start = _u32(e, 116)
        size = _u32(e, 120)  # < 2 GiB for any real workbook stream
        if typ == 5:
            root = (start, size)
        elif typ == 2 and target is None and name in names:
            target = (start, size)
    if target is None:
        raise ValueError(f"compound file has no {'/'.join(names)} stream")
    start, size = target
    if size >= mini_cutoff:
        raw = b"".join(sector(i) for i in chain(start, fat))
        return raw[:size]
    if root is None:
        raise ValueError("corrupt compound file: no root entry")
    minifat: list[int] = []
    for i in chain(minifat_start, fat):
        minifat += struct.unpack(f"<{per}I", sector(i))
    ministream = b"".join(sector(i) for i in chain(root[0], fat))
    raw = b"".join(
        ministream[i * msz : (i + 1) * msz] for i in chain(start, minifat)
    )
    return raw[:size]


# --------------------------------------------------------------- BIFF read


class _Chunks:
    """Cursor over an SST record body plus its CONTINUE bodies. Fixed-width
    fields read seamlessly across chunk boundaries; character runs are read
    chunk-aware by the caller because each continuation restarts with a
    fresh high-byte flag ([MS-XLS] 2.5.293)."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.off = 0

    def _norm(self) -> None:
        while self.ci < len(self.chunks) and self.off >= len(
            self.chunks[self.ci]
        ):
            self.off -= len(self.chunks[self.ci])
            self.ci += 1

    def eof(self) -> bool:
        self._norm()
        return self.ci >= len(self.chunks)

    def avail_in_chunk(self) -> int:
        self._norm()
        if self.ci >= len(self.chunks):
            return 0
        return len(self.chunks[self.ci]) - self.off

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._norm()
            if self.ci >= len(self.chunks):
                raise ValueError("truncated SST string data")
            take = min(n, len(self.chunks[self.ci]) - self.off)
            out += self.chunks[self.ci][self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)


def _read_rich_string(cur: _Chunks) -> str:
    """XLUnicodeRichExtendedString: cch, flags, [rich count], [ext size],
    characters (possibly continued with per-chunk flag bytes), then the
    rich-run / extension payloads to skip."""
    cch = _u16(cur.read(2))
    flags = cur.read(1)[0]
    high = flags & 0x01
    crun = _u16(cur.read(2)) if flags & 0x08 else 0
    cbext = _u32(cur.read(4)) if flags & 0x04 else 0
    parts: list[str] = []
    remaining = cch
    while remaining > 0:
        width = 2 if high else 1
        take = min(remaining, cur.avail_in_chunk() // width)
        if take:
            raw = cur.read(take * width)
            parts.append(raw.decode("utf-16-le" if high else "latin-1"))
            remaining -= take
        if remaining > 0:
            # characters continue into the next CONTINUE record, which
            # opens with a fresh high-byte flag ([MS-XLS] 2.5.293)
            high = cur.read(1)[0] & 0x01
    cur.read(crun * 4 + cbext)
    return "".join(parts)


def _read_cell_string(data: bytes, off: int) -> str:
    """XLUnicodeString (2-byte length) inside one record — LABEL cells."""
    cch = _u16(data, off)
    high = data[off + 2] & 0x01
    raw = data[off + 3 : off + 3 + cch * (2 if high else 1)]
    return raw.decode("utf-16-le" if high else "latin-1")


def _num_str(v: float) -> str:
    """Number cell to text, matching how a text-by-default ingest renders a
    spreadsheet number: integral doubles drop the '.0'."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _rk_value(rk: int) -> float:
    div100 = rk & 0x01
    if rk & 0x02:
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        v = float(v)
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if div100 else v


def _parse_sst(chunks: list[bytes]) -> list[str]:
    cur = _Chunks(chunks)
    n_unique = struct.unpack("<II", cur.read(8))[1]
    return [_read_rich_string(cur) for _ in range(n_unique)]


def _records(stream: bytes):
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield pos, op, stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


def read_xls_rows(path: str, sheet: int = 0) -> list[list[str | None]]:
    """First-sheet rows of a BIFF8 ``.xls`` workbook as lists of cell
    strings (None for blanks) — the read_xlsx_rows contract.

    Error contract (r10 verdict #8): malformed real-world files — bytes
    truncated mid-record, bit flips in sector chains, SST counts pointing
    past the data — surface as actionable ``ValueError``s naming the file
    as corrupt, never as bare ``struct.error``/``IndexError`` leaking the
    parser's internals (fuzz-pinned in tests/test_xls.py)."""
    try:
        return _read_xls_rows_checked(path, sheet)
    except (ValueError, NotImplementedError):
        raise
    except Exception as e:
        raise ValueError(
            f"corrupt .xls workbook ({type(e).__name__}: {e})"
        ) from e


def _read_xls_rows_checked(path: str, sheet: int = 0):
    with open(path, "rb") as f:
        data = f.read()
    stream = _cfb_stream(data, ("Workbook", "Book"))

    # ---- workbook globals: version gate, SST, sheet offsets
    sst: list[str] = []
    sheet_offsets: list[int] = []
    sst_chunks: list[bytes] | None = None
    for pos, op, body in _records(stream):
        if pos == 0:
            if op != _BOF:
                raise ValueError("not a BIFF workbook stream (no BOF)")
            vers = _u16(body, 0)
            if vers != 0x0600:
                raise ValueError(
                    f"unsupported .xls BIFF version 0x{vers:04x} — only "
                    "BIFF8 (Excel 97+) is readable; re-save the workbook "
                    "as .xlsx or BIFF8 .xls"
                )
        elif op == _FILEPASS:
            raise ValueError(
                "encrypted .xls workbook (FILEPASS) — remove the password "
                "and re-save, or convert to .xlsx"
            )
        elif op == _BOUNDSHEET:
            sheet_offsets.append(_u32(body, 0))
        elif op == _SST:
            sst_chunks = [body]
        elif op == _CONTINUE and sst_chunks is not None:
            sst_chunks.append(body)
        elif op == _EOF:
            break
        if op not in (_SST, _CONTINUE) and sst_chunks is not None:
            # SST continuations are contiguous; first other record seals it
            sst = _parse_sst(sst_chunks)
            sst_chunks = None
    if sst_chunks is not None:  # SST was the last globals record
        sst = _parse_sst(sst_chunks)
    if not sheet_offsets:
        return []
    if sheet >= len(sheet_offsets):
        raise ValueError(f"workbook has {len(sheet_offsets)} sheets")

    # ---- sheet substream: collect (row, col) -> text
    cells: dict[tuple[int, int], str | None] = {}
    pending_formula_cell: tuple[int, int] | None = None
    for _, op, body in _records(stream[sheet_offsets[sheet] :]):
        if op == _EOF:
            break
        elif op == _LABELSST:
            r, c = _u16(body, 0), _u16(body, 2)
            cells[(r, c)] = sst[_u32(body, 6)]
        elif op == _LABEL:
            r, c = _u16(body, 0), _u16(body, 2)
            cells[(r, c)] = _read_cell_string(body, 6)
        elif op == _NUMBER:
            r, c = _u16(body, 0), _u16(body, 2)
            cells[(r, c)] = _num_str(struct.unpack_from("<d", body, 6)[0])
        elif op == _RK:
            r, c = _u16(body, 0), _u16(body, 2)
            cells[(r, c)] = _num_str(_rk_value(_u32(body, 6)))
        elif op == _MULRK:
            r, c0 = _u16(body, 0), _u16(body, 2)
            n_cells = (len(body) - 6) // 6
            for i in range(n_cells):
                rk = _u32(body, 4 + i * 6 + 2)
                cells[(r, c0 + i)] = _num_str(_rk_value(rk))
        elif op == _BOOLERR:
            r, c = _u16(body, 0), _u16(body, 2)
            val, is_err = body[6], body[7]
            cells[(r, c)] = None if is_err else ("TRUE" if val else "FALSE")
        elif op == _FORMULA:
            r, c = _u16(body, 0), _u16(body, 2)
            cached = body[6:14]
            if cached[6:8] == b"\xff\xff":
                kind = cached[0]
                if kind == 0:  # string result arrives in the next STRING rec
                    pending_formula_cell = (r, c)
                elif kind == 1:
                    cells[(r, c)] = "TRUE" if cached[2] else "FALSE"
                else:  # error / blank cached result
                    cells[(r, c)] = None
            else:
                cells[(r, c)] = _num_str(struct.unpack("<d", cached)[0])
        elif op == _STRING and pending_formula_cell is not None:
            cur = _Chunks([body])
            cells[pending_formula_cell] = _read_rich_string(cur)
            pending_formula_cell = None

    if not cells:
        return []
    width = max(c for _, c in cells) + 1
    out: list[list[str | None]] = []
    for r in range(max(r for r, _ in cells) + 1):
        row = [cells.get((r, c)) for c in range(width)]
        if any(v is not None for v in row):
            out.append(row)
    return out


# -------------------------------------------------------------- BIFF write


def _rec(op: int, body: bytes) -> bytes:
    return struct.pack("<HH", op, len(body)) + body


def _sst_records(strings: list[str], split_at: int | None) -> bytes:
    """SST (+ optional forced CONTINUE) for a list of unique strings, all
    compressed (latin-1-safe fixtures) unless a char needs the high byte.
    ``split_at``: index of the string whose characters are split across a
    CONTINUE boundary (pins the continuation path in tests)."""

    def enc(s: str) -> bytes:
        try:
            raw = s.encode("latin-1")
            return struct.pack("<HB", len(s), 0) + raw
        except UnicodeEncodeError:
            return struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")

    head = struct.pack("<II", len(strings), len(strings))
    if split_at is None:
        return _rec(_SST, head + b"".join(enc(s) for s in strings))
    first = head + b"".join(enc(s) for s in strings[:split_at])
    s = strings[split_at]
    cut = max(1, len(s) // 2)
    try:
        s.encode("latin-1")
        high = 0
    except UnicodeEncodeError:
        high = 1
    codec = "utf-16-le" if high else "latin-1"
    # chars [0:cut] end the SST record; the CONTINUE opens with a fresh
    # flag byte before chars [cut:] ([MS-XLS] 2.5.293)
    first += struct.pack("<HB", len(s), high) + s[:cut].encode(codec)
    cont = bytes([high]) + s[cut:].encode(codec)
    cont += b"".join(enc(x) for x in strings[split_at + 1 :])
    return _rec(_SST, first) + _rec(_CONTINUE, cont)


def _workbook_stream(
    headers: list[str],
    rows: list[tuple],
    numeric_cols: set[int],
    sst_split: int | None,
) -> bytes:
    """Minimal BIFF8 Workbook stream: globals (BOF, CODEPAGE, BOUNDSHEET,
    SST, EOF) + one sheet substream of LABELSST/NUMBER cells."""
    grid: list[list[object]] = [list(headers)] + [list(r) for r in rows]
    strings: list[str] = []
    index: dict[str, int] = {}
    for r_i, row in enumerate(grid):
        for c_i, v in enumerate(row):
            if v is None or (c_i in numeric_cols and r_i > 0):
                continue
            s = str(v)
            if s not in index:
                index[s] = len(strings)
                strings.append(s)

    sheet = _rec(
        _BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0)
    )
    for r_i, row in enumerate(grid):
        for c_i, v in enumerate(row):
            if v is None:
                continue
            if c_i in numeric_cols and r_i > 0:
                sheet += _rec(
                    _NUMBER,
                    struct.pack("<HHH", r_i, c_i, 0)
                    + struct.pack("<d", float(v)),
                )
            else:
                sheet += _rec(
                    _LABELSST,
                    struct.pack("<HHHI", r_i, c_i, 0, index[str(v)]),
                )
    sheet += _rec(_EOF, b"")

    bof = _rec(
        _BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0)
    )
    codepage = _rec(_CODEPAGE, struct.pack("<H", 0x04B0))
    name = "Sheet1"
    bsheet_body = (
        struct.pack("<IBB", 0, 0, 0)
        + bytes([len(name), 0])
        + name.encode("latin-1")
    )
    bsheet = _rec(_BOUNDSHEET, bsheet_body)
    sst = _sst_records(strings, sst_split)
    eof = _rec(_EOF, b"")
    globals_len = len(bof) + len(codepage) + len(bsheet) + len(sst) + len(eof)
    # backpatch the sheet's absolute stream offset into BOUNDSHEET
    bsheet_body = (
        struct.pack("<IBB", globals_len, 0, 0)
        + bytes([len(name), 0])
        + name.encode("latin-1")
    )
    bsheet = _rec(_BOUNDSHEET, bsheet_body)
    return bof + codepage + bsheet + sst + eof + sheet


def _cfb_wrap(stream: bytes) -> bytes:
    """Wrap one 'Workbook' stream in a minimal v3 compound file. Streams
    under the 4096-byte mini cutoff go in the mini-stream per spec; larger
    ones use regular FAT sectors."""
    ssz, msz = 512, 64
    in_mini = len(stream) < 4096

    def chain_words(n_sectors: int, first: int = 0) -> list[int]:
        """FAT entries for sectors first..first+n-1 chained in order: entry
        k points at sector first+k+1, the last is ENDOFCHAIN."""
        return [first + i + 1 for i in range(n_sectors - 1)] + [_ENDOFCHAIN]

    if in_mini:
        n_mini = max(1, -(-len(stream) // msz))
        ministream = stream + b"\x00" * (n_mini * msz - len(stream))
        n_mini_sect = -(-len(ministream) // ssz)
        # sectors: [0]=FAT [1]=directory [2]=miniFAT [3..]=ministream
        fat = [_FATSECT, _ENDOFCHAIN, _ENDOFCHAIN]
        fat += chain_words(n_mini_sect, 3)
        fat += [_FREESECT] * (ssz // 4 - len(fat))
        minifat = chain_words(n_mini)
        minifat += [_FREESECT] * (ssz // 4 - len(minifat))
        root_start, root_size = 3, len(ministream)
        wb_start, wb_size = 0, len(stream)
        minifat_start, n_minifat = 2, 1
        payload = ministream + b"\x00" * (n_mini_sect * ssz - len(ministream))
    else:
        n_sect = -(-len(stream) // ssz)
        fat = [_FATSECT, _ENDOFCHAIN]
        fat += chain_words(n_sect, 2)
        fat += [_FREESECT] * (ssz // 4 - len(fat))
        if len(fat) > ssz // 4:
            raise ValueError("fixture workbook too large for one FAT sector")
        minifat = []
        root_start, root_size = _ENDOFCHAIN, 0
        wb_start, wb_size = 2, len(stream)
        minifat_start, n_minifat = _ENDOFCHAIN, 0
        payload = stream + b"\x00" * (n_sect * ssz - len(stream))

    def dirent(
        name: str, typ: int, start: int, size: int, child: int = _NOSTREAM
    ) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = raw + b"\x00" * (64 - len(raw))
        e += struct.pack("<HBB", len(raw), typ, 1)
        e += struct.pack("<III", _NOSTREAM, _NOSTREAM, child)
        e += b"\x00" * 16 + b"\x00" * 4 + b"\x00" * 16
        e += struct.pack("<IQ", start, size)
        return e

    directory = dirent("Root Entry", 5, root_start, root_size, child=1)
    directory += dirent("Workbook", 2, wb_start, wb_size)
    directory += b"\x00" * 128 * 2

    header = bytearray(512)
    header[0:8] = OLE_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte mini sectors
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, 1)  # directory at sector 1
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, minifat_start)
    struct.pack_into("<I", header, 64, n_minifat)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)  # DIFAT[0] = FAT sector 0
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREESECT)

    out = bytes(header)
    out += struct.pack(f"<{ssz // 4}I", *fat)
    if in_mini:
        out += directory + struct.pack(f"<{ssz // 4}I", *minifat) + payload
    else:
        out += directory + payload
    return out


def write_xls(
    path: str,
    headers: list[str],
    rows: list[tuple],
    numeric_cols: set[int] | None = None,
    sst_split: int | None = None,
) -> None:
    """Write a minimal single-sheet BIFF8 ``.xls`` — fixture twin of
    ingest/xlsx.py's write_xlsx. ``numeric_cols``: 0-based columns stored
    as NUMBER records instead of SST strings; ``sst_split``: force the
    SST string at that index to straddle a CONTINUE boundary."""
    stream = _workbook_stream(
        list(headers), list(rows), numeric_cols or set(), sst_split
    )
    with open(path, "wb") as f:
        f.write(_cfb_wrap(stream))
