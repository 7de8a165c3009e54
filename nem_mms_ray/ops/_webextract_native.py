"""Self-compiling ctypes glue for the single-pass HTML extraction kernel
(`webextract_kernel.c`) — same pattern as `codecs/_fsst_native.py`: the
shared object builds once per source hash under /tmp (cc -O3, ~1s), every
worker process reuses the cached .so, and a missing compiler degrades to
`None` so callers fall back to the Arrow RE2 chain (identical output,
slower).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np
import pyarrow as pa

_SRC = Path(__file__).with_name("webextract_kernel.c")
_BUILD_DIR = Path(tempfile.gettempdir()) / "nem_mms_ray_build"
_LIB: ctypes.CDLL | None = None
_TRIED = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_i64p = ctypes.POINTER(ctypes.c_int64)


def _compile() -> ctypes.CDLL | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so = _BUILD_DIR / f"wet_{tag}.so"
    if not so.exists():
        _BUILD_DIR.mkdir(parents=True, exist_ok=True)
        with tempfile.NamedTemporaryFile(suffix=".so", dir=_BUILD_DIR,
                                         delete=False) as tf:
            tmp = tf.name
        built = False
        for flags in (["-O3", "-march=native"], ["-O3"]):
            cmd = ["cc", *flags, "-shared", "-fPIC", "-o", tmp, str(_SRC)]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
                os.replace(tmp, so)
                built = True
                break
            except Exception:
                continue
        if not built:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    lib = ctypes.CDLL(str(so))
    lib.wet_extract_batch.restype = ctypes.c_long
    lib.wet_extract_batch.argtypes = [_u8p, _i64p, ctypes.c_long, _u8p, _i64p]
    return lib


def get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _compile()
        except Exception:
            _LIB = None
    return _LIB


def extract_batch(col: pa.Array | pa.ChunkedArray) -> pa.Array | None:
    """C fast path: one call extracts a whole binary column (Arrow
    large_binary layout passes straight through as (data, offsets) — no
    per-row Python until the final decode).  Returns the extracted string
    array, or None when the kernel is unavailable or the input isn't
    binary (caller falls back to the Arrow chain)."""
    lib = get_lib()
    if lib is None:
        return None
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not (pa.types.is_binary(a.type) or pa.types.is_large_binary(a.type)):
        return None
    a = a.cast(pa.large_binary())
    n = len(a)
    if n == 0:
        return pa.array([], pa.string())
    off = np.frombuffer(a.buffers()[1], np.int64,
                        count=a.offset + n + 1)[a.offset:]
    dbuf = a.buffers()[2]
    data = (np.frombuffer(dbuf, np.uint8, count=dbuf.size)
            if dbuf is not None and dbuf.size else np.zeros(1, np.uint8))
    out = np.empty(int(off[-1] - off[0]) + n + 8, np.uint8)
    out_off = np.empty(n + 1, np.int64)
    off_c = np.ascontiguousarray(off)
    lib.wet_extract_batch(
        data.ctypes.data_as(_u8p), off_c.ctypes.data_as(_i64p),
        ctypes.c_long(n), out.ctypes.data_as(_u8p),
        out_off.ctypes.data_as(_i64p))
    total = int(out_off[n])
    buf = out[:total].tobytes()
    if buf.count(b"\x00") == n - 1:
        # only the kernel's separators: ONE C-speed decode, split per row
        texts = buf.decode("utf-8", "replace").split("\x00")
    else:
        # a row's own bytes contain 0x00 — slice rows via out_off
        texts = [
            buf[int(out_off[r]):int(out_off[r + 1]) - (1 if r < n - 1 else 0)]
            .decode("utf-8", "replace")
            for r in range(n)
        ]
    if a.null_count:
        nulls = np.asarray(pa.compute.is_null(a))
        texts = [None if m else t for t, m in zip(texts, nulls)]
    return pa.array(texts, pa.string())
