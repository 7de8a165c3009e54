"""MMS flat-file parsing: CSV bytes -> segmented, typed Arrow tables.

One file = one Ray work unit; intra-file row order is the segmentation
contract (G1: a data row binds to the most recent preceding header row,
/root/reference/src/flatfile.rs:83-103).  Within a file:

1. csv.reader (C implementation) streams rows, flexible width, no header
   (reader config parity: /root/reference/src/main.rs:161-165)
2. row classification on column 0: "C"/"I"/"D" -> comment/header/data,
   anything else is a typed error (/root/reference/src/flatfile.rs:290-322)
3. ordered segmentation: I opens a table, D rows append, next I/C closes;
   a D before any I is skipped (/root/reference/src/flatfile.rs:98)
4. header dispatch -> package schema (schemas.package_for_header); columns
   bind by HEADER NAME not position, extra CSV columns are dropped, missing
   headers error (/root/reference/src/flatfile.rs:109-132, 499-505)
5. whole-column vectorized typed casts (typed_cast) replace the reference's
   per-scalar DataValue cascade
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from nem_mms_ray.mms.schemas import PackageDef, package_for_header
from nem_mms_ray.mms.typed_cast import cast_column


class MmsParseError(ValueError):
    pass


def underline_record(row: list[str], idx: int,
                     expected: list[str] | None = None) -> str:
    """Caret-underlined record rendering — parity with the reference's
    error display (/root/reference/src/error.rs:109-170, tested :173-206):
    the offending record printed with the bad field underlined by '^'s
    (field offset accounts for the joining commas); an out-of-range index
    points three carets past the end.  We omit the ANSI red coloring."""
    joined = ",".join(row)
    if idx < len(row):
        pre = sum(len(f) for f in row[:idx]) + idx
        carets = "^" * len(row[idx])
    else:
        pre = len(joined)
        carets = "^^^"
    out = f"\n\n\t{joined}\n\t{' ' * pre}{carets}\n\n"
    if expected is not None:
        out += "Expected one of [" + ", ".join(f'"{e}"' for e in expected) + "]\n"
    return out


@dataclass
class CommentRecord:
    """C rows: END OF REPORT / blind-update / EMMS general
    (/root/reference/src/flatfile.rs:333-359)."""

    kind: str                     # "EOR" | "BUT" | "EMMS"
    cells: list[str]
    count_of_records: int | None = None  # EOR control total (:481-487)


@dataclass
class FlatFileTable:
    package: PackageDef | None    # None = unrecognized header
    report_type: str
    report_subtype: str
    report_version: int
    column_headers: list[str]
    data_rows: list[list[str]] = field(default_factory=list)
    # fast-path representation: positional arrow string columns (cells after
    # the 4 key fields), parsed in bulk by pyarrow.csv — exactly one of
    # data_rows / data_columns carries the rows
    data_columns: list[pa.Array] | None = None

    @property
    def num_data_rows(self) -> int:
        if self.data_columns is not None:
            return len(self.data_columns[0]) if self.data_columns else 0
        return len(self.data_rows)

    def to_arrow(self) -> pa.Table:
        """Pivot rows -> typed arrow per the bound schema (P10/P11)."""
        if self.package is None:
            raise MmsParseError(
                f"unrecognized package ({self.report_type}, {self.report_subtype})"
            )
        schema = self.package.schema
        header_idx = {h: i for i, h in enumerate(self.column_headers)}
        arrays = []
        for f in schema:
            if f.name not in header_idx:
                raise MmsParseError(f"missing column header {f.name!r}")
            ci = header_idx[f.name]
            if self.data_columns is not None:
                col = (self.data_columns[ci] if ci < len(self.data_columns)
                       else pa.nulls(self.num_data_rows, pa.string()))
            else:
                col = [
                    row[ci] if ci < len(row) else None
                    for row in self.data_rows
                ]
            arrays.append(cast_column(col, f))
        return pa.Table.from_arrays(arrays, schema=schema)


@dataclass
class ParsedFlatFile:
    tables: list[FlatFileTable]
    comments: list[CommentRecord]

    @property
    def data_row_count(self) -> int:
        return sum(t.num_data_rows for t in self.tables)

    def total_record_count(self) -> int:
        """Observed C+I+D record total — what the END OF REPORT control
        total declares (its count includes the header comment, every I and
        D row, and the EOR row itself)."""
        return len(self.comments) + len(self.tables) + self.data_row_count

    def end_of_report_count(self) -> int | None:
        """The file's own control total — parsed but never verified by the
        reference (/root/reference/src/flatfile.rs:477-487); we surface it."""
        for c in self.comments:
            if c.kind == "EOR":
                return c.count_of_records
        return None


def _parse_comment(row: list[str]) -> CommentRecord:
    if len(row) >= 3 and row[1] == "END OF REPORT":
        try:
            return CommentRecord("EOR", row, count_of_records=int(row[2]))
        except ValueError as e:
            raise MmsParseError(
                f"bad END OF REPORT count: {row[2]!r}"
                + underline_record(row, 2)) from e
    if len(row) > 2 and row[2] in ("BLIND_UPDATE_SUBMISSION", "BLIND_UPDATE_RESPONSE"):
        return CommentRecord("BUT", row)
    return CommentRecord("EMMS", row)


def parse_flatfile_bytes(data: bytes) -> ParsedFlatFile:
    """Parse one MMS CSV file held in memory.

    Quote-free files (the overwhelmingly common case) take a bulk path:
    line tags classify via one pass over first bytes, and each table's
    uniform D-block parses as one pyarrow.csv read (C kernels, ~10x the
    row-loop's throughput).  Files containing '"' — or any block the bulk
    CSV reader rejects — fall back to the row-by-row reference semantics.
    """
    if b'"' not in data:
        try:
            return _parse_fast(data)
        except MmsParseError:
            raise
        except Exception:
            pass  # structural surprise: defer to the row-by-row path
    return _parse_rows(data)


def _parse_fast(data: bytes) -> ParsedFlatFile:
    import pyarrow.csv as pacsv

    # numpy line scan: starts/ends of every line + its first byte, no
    # per-line bytes objects materialized for the (dominant) D rows
    buf = np.frombuffer(data, np.uint8)
    nl = np.flatnonzero(buf == np.uint8(10))
    n_lines = len(nl) + (0 if (len(buf) and buf[-1] == 10) else 1)
    starts = np.empty(n_lines, np.int64)
    ends = np.empty(n_lines, np.int64)
    starts[0] = 0
    starts[1:] = nl[: n_lines - 1] + 1
    ends[: len(nl)] = nl[: n_lines if n_lines <= len(nl) else len(nl)]
    if n_lines > len(nl):
        ends[-1] = len(buf)
    first = np.zeros(n_lines, np.uint8)
    nonempty = starts < ends
    first[nonempty] = buf[starts[nonempty]]
    # A D run line must have first *field* exactly "D" (flatfile.rs:292-294):
    # require the byte after the tag to be a comma or line end, so e.g.
    # "DUMMY,..." routes to the non-D loop and raises like the row path.
    second = np.zeros(n_lines, np.uint8)
    has2 = starts + 1 < ends
    second[has2] = buf[np.minimum(starts + 1, len(buf) - 1)][has2]
    is_d = (first == np.uint8(68)) & (
        (second == np.uint8(44)) | (second == np.uint8(13)) | ~has2
    )

    tables: list[FlatFileTable] = []
    comments: list[CommentRecord] = []
    current: FlatFileTable | None = None
    # boundary = last non-blank non-D line processed; lines strictly between
    # two boundaries are all D rows (we enumerate every non-D line below),
    # plus possibly blanks — a blank inside a run makes pyarrow.csv reject
    # the block, which falls this file back to the row path
    boundary = -1

    def flush_run(upto: int) -> None:
        """Bulk-parse the D run in lines (boundary, upto) into `current`."""
        run_start = boundary + 1
        if run_start >= upto:
            return
        if current is None:
            return  # data before any header is skipped (G1)
        block = data[starts[run_start] : ends[upto - 1]]
        ncols = int(np.count_nonzero(
            buf[starts[run_start] : ends[run_start]] == np.uint8(44)
        )) + 1
        if ncols < 4:
            raise ValueError("short data record")  # row path raises the typed error
        tbl = pacsv.read_csv(
            io.BytesIO(block),
            read_options=pacsv.ReadOptions(autogenerate_column_names=True),
            convert_options=pacsv.ConvertOptions(
                column_types={f"f{i}": pa.string() for i in range(ncols)},
                strings_can_be_null=False,
                null_values=[],
            ),
        )
        if tbl.num_columns != ncols:
            raise ValueError("width drift in D block")
        current.data_columns = [
            tbl.column(i).combine_chunks() for i in range(4, ncols)
        ]

    for i in np.flatnonzero(~is_d):
        i = int(i)
        ln = data[starts[i] : ends[i]]
        if not ln.strip():
            continue  # blank lines neither close tables nor carry rows
        flush_run(i)
        boundary = i
        row = next(csv.reader([ln.decode("utf-8", "replace")]))
        if not row:
            continue
        tag = row[0]  # exact first-field match, like _parse_rows
        if tag == "I":
            if len(row) < 4:
                raise MmsParseError(f"short information record: {row!r}"
                                    + underline_record(row, len(row)))
            try:
                version = int(row[3])
            except ValueError as e:
                raise MmsParseError(f"bad report version {row[3]!r}"
                                    + underline_record(row, 3)) from e
            current = FlatFileTable(
                package=package_for_header(row[1], row[2]),
                report_type=row[1],
                report_subtype=row[2],
                report_version=version,
                column_headers=row[4:],
                data_columns=[],
            )
            tables.append(current)
        elif tag == "C":
            comments.append(_parse_comment(row))
            current = None
        else:
            raise MmsParseError(
                f"unrecognized record tag {tag!r}"
                + underline_record(row, 0, ["C", "I", "D"])
            )
    flush_run(n_lines)
    return ParsedFlatFile(tables=tables, comments=comments)


def _parse_rows(data: bytes) -> ParsedFlatFile:
    reader = csv.reader(io.StringIO(data.decode("utf-8", "replace")))
    tables: list[FlatFileTable] = []
    comments: list[CommentRecord] = []
    current: FlatFileTable | None = None

    for row in reader:
        if not row:
            continue
        tag = row[0]
        if tag == "I":
            if len(row) < 4:
                raise MmsParseError(f"short information record: {row!r}"
                                    + underline_record(row, len(row)))
            try:
                version = int(row[3])
            except ValueError as e:
                raise MmsParseError(f"bad report version {row[3]!r}"
                                    + underline_record(row, 3)) from e
            headers = row[4:]
            current = FlatFileTable(
                package=package_for_header(row[1], row[2]),
                report_type=row[1],
                report_subtype=row[2],
                report_version=version,
                column_headers=headers,
            )
            tables.append(current)
        elif tag == "D":
            if current is None:
                continue  # data before any header is skipped (G1)
            if len(row) < 4:
                raise MmsParseError(f"short data record: {row!r}"
                                    + underline_record(row, len(row)))
            current.data_rows.append(row[4:])
        elif tag == "C":
            comments.append(_parse_comment(row))
            current = None  # a comment closes the open table
        else:
            raise MmsParseError(
                f"unrecognized record tag {tag!r}"
                + underline_record(row, 0, ["C", "I", "D"])
            )
    return ParsedFlatFile(tables=tables, comments=comments)
