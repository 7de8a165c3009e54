"""Input expansion: directories, CSVs, and (recursively nested) zips.

Parity with the reference's S2/S3 sources: `read_zip` recurses zip-of-zips
and parses every inner .csv (/root/reference/src/zip.rs:13-40);
`expand_paths` walks directories by extension — .csv/.CSV parse, .zip/.ZIP
open, subdirectories recurse, anything else is ignored
(/root/reference/src/main.rs:158-190).
"""

from __future__ import annotations

import io
import zipfile
from pathlib import Path


def iter_zip_csv_bytes(data: bytes):
    """Yield (inner_name, csv_bytes) from a zip, recursing into nested zips."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for name in zf.namelist():
            low = name.lower()
            if low.endswith(".zip"):
                yield from iter_zip_csv_bytes(zf.read(name))
            elif low.endswith(".csv"):
                yield name, zf.read(name)
            # other entries skipped


def expand_paths(path: str | Path) -> list[Path]:
    """Resolve a path into the flat list of .csv/.zip files to parse."""
    p = Path(path)
    if p.is_dir():
        out: list[Path] = []
        for child in sorted(p.iterdir()):
            out.extend(expand_paths(child))
        return out
    if p.suffix.lower() in (".csv", ".zip"):
        return [p]
    return []


def iter_file_csv_bytes(path: str | Path):
    """Yield (source_name, csv_bytes) for one on-disk file (csv or zip)."""
    p = Path(path)
    if p.suffix.lower() == ".zip":
        yield from iter_zip_csv_bytes(p.read_bytes())
    else:
        yield str(p), p.read_bytes()
