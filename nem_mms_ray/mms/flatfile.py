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

import pyarrow as pa

from nem_mms_ray.mms.schemas import PackageDef, package_for_header
from nem_mms_ray.mms.typed_cast import cast_column


class MmsParseError(ValueError):
    pass


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
        return sum(len(t.data_rows) for t in self.tables)

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
            raise MmsParseError(f"bad END OF REPORT count: {row[2]!r}") from e
    if len(row) > 2 and row[2] in ("BLIND_UPDATE_SUBMISSION", "BLIND_UPDATE_RESPONSE"):
        return CommentRecord("BUT", row)
    return CommentRecord("EMMS", row)


def parse_flatfile_bytes(data: bytes) -> ParsedFlatFile:
    """Parse one MMS CSV file held in memory."""
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
                raise MmsParseError(f"short information record: {row!r}")
            try:
                version = int(row[3])
            except ValueError as e:
                raise MmsParseError(f"bad report version {row[3]!r}") from e
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
                raise MmsParseError(f"short data record: {row!r}")
            current.data_rows.append(row[4:])
        elif tag == "C":
            comments.append(_parse_comment(row))
            current = None  # a comment closes the open table
        else:
            raise MmsParseError(
                f"unrecognized record tag {tag!r} (expected one of C, I, D)"
            )
    return ParsedFlatFile(tables=tables, comments=comments)
