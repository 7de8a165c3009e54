"""Depository (manage) layer: data-directory state + filename round-trip.

Completes the reference's `manage` module
(/root/reference/src/manage/state.rs:104-148, whose `update` was stubbed,
/root/reference/src/main.rs:148-150): init creates `data/`, `.raw/` and a
config file; the filename scheme `PKG/historic_{yyyy}-{mm}.parquet` and
`PKG/nonhistoric_{yyyy-mm-dd}_{file_id}.parquet` renders/parses as mutual
inverses — the round-trip contract the reference pins in its own tests
(/root/reference/src/manage/state.rs:155-191).  Config is JSON rather than
TOML (no TOML writer in this environment's stdlib; the config content is
ours, not the reference's).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from pathlib import Path

from nem_mms_ray.mms.schemas import PACKAGES

_HISTORIC_RE = re.compile(r"^historic_(\d{4})-(\d{2})$")
_NONHISTORIC_RE = re.compile(r"^nonhistoric_(\d{4}-\d{2}-\d{2})_(.+)$")


@dataclass(frozen=True)
class HistoricFilename:
    package: str
    year: int
    month: int

    def as_path(self) -> Path:
        return Path(self.package) / f"historic_{self.year:04d}-{self.month:02d}.parquet"


@dataclass(frozen=True)
class NonHistoricFilename:
    package: str
    report_date: str  # YYYY-MM-DD
    file_id: str

    def as_path(self) -> Path:
        return Path(self.package) / f"nonhistoric_{self.report_date}_{self.file_id}.parquet"


def filename_from_path(path: Path) -> HistoricFilename | NonHistoricFilename:
    package = path.parent.name
    if package not in PACKAGES:
        raise ValueError(f"unrecognized package dir in {path}")
    stem = path.stem
    m = _HISTORIC_RE.match(stem)
    if m:
        year, month = int(m.group(1)), int(m.group(2))
        if not 1 <= month <= 12:
            raise ValueError(f"bad month in {path}")
        return HistoricFilename(package, year, month)
    m = _NONHISTORIC_RE.match(stem)
    if m:
        return NonHistoricFilename(package, m.group(1), m.group(2))
    raise ValueError(f"unrecognized filename {path}")


@dataclass
class DepositoryState:
    base: Path
    files: list
    config: dict

    @classmethod
    def init(cls, path: str | Path) -> "DepositoryState":
        base = Path(path)
        base.mkdir(parents=True, exist_ok=True)
        (base / "data").mkdir(exist_ok=True)
        (base / ".raw").mkdir(exist_ok=True)
        config = {"version": 1, "packages": sorted(PACKAGES)}
        (base / "config.json").write_text(json.dumps(config, indent=2))
        return cls(base=base, files=[], config=config)

    @classmethod
    def from_path(cls, path: str | Path) -> "DepositoryState":
        base = Path(path)
        files = []
        for p in sorted((base / "data").rglob("*.parquet")):
            files.append(filename_from_path(p))
        config = json.loads((base / "config.json").read_text())
        return cls(base=base, files=files, config=config)
