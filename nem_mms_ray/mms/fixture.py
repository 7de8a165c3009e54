"""Deterministic synthetic MMS flat-file corpus (bench / test input).

Shape mirrors real DISPATCHSCADA files the reference parses
(/root/reference/src/flatfile.rs:644-704 fixtures): an EMMS comment header,
one I record, a run of D records, and the END OF REPORT control total,
zipped one CSV per zip like nemweb distributes them.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

HEADER = (
    b"C,NEMP.WORLD,DISPATCHSCADA,AEMO,PUBLIC,2021/04/01,04:43:39,"
    b"339145123,DISPATCHSCADA,339145118\n"
    b"I,DISPATCH,UNIT_SCADA,1,SETTLEMENTDATE,DUID,SCADAVALUE\n"
)


def scada_csv(rows: int, seed: int = 0) -> bytes:
    """One deterministic DISPATCHSCADA flat file with `rows` data records."""
    out = [HEADER]
    for i in range(rows):
        t = (seed * 7919 + i) % 86400
        hh, mm, ss = t // 3600, (t // 60) % 60, (t % 60) // 5 * 5
        unit = (seed * 31 + i) % 400
        # ~1/50 empty SCADAVALUE exercises the null path
        val = b"" if (i + seed) % 50 == 0 else (
            f"{((seed + 1) * 131 + i * 17) % 100000 / 100:.2f}".encode()
        )
        out.append(
            b"D,DISPATCH,UNIT_SCADA,1,2021/04/%02d %02d:%02d:%02d,UNIT%d,%s\n"
            % (1 + seed % 28, hh, mm, ss, unit, val)
        )
    out.append(b"C,END OF REPORT,%d\n" % (rows + 3))
    return b"".join(out)


def make_scada_corpus(out_dir: str | Path, n_files: int, rows_per_file: int) -> dict:
    """Write n_files zipped flat files; idempotent.  Returns {files, csv_bytes}."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    total = 0
    for f in range(n_files):
        zpath = out_dir / f"PUBLIC_DISPATCHSCADA_{f:04d}.zip"
        data = scada_csv(rows_per_file, seed=f)
        total += len(data)
        if not zpath.exists():
            with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
                z.writestr(f"PUBLIC_DISPATCHSCADA_{f:04d}.CSV", data)
    return {"files": n_files, "csv_bytes": total}
