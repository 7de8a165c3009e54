"""Build + ctypes binding for the FSST C kernels, with pure-Python fallback.

The shared library is compiled once per source hash into /tmp (scratch) and
cached; if no C compiler is available the pure-Python reference loops are
used (identical output, much slower).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

ESCAPE = 255
_SRC = Path(__file__).with_name("fsst_kernel.c")
_BUILD_DIR = Path(os.environ.get("NEM_MMS_RAY_BUILD", "/tmp/nem_mms_ray_build"))

_lib = None
_tried = False


def _compile() -> ctypes.CDLL | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so = _BUILD_DIR / f"fsst_{tag}.so"
    if not so.exists():
        _BUILD_DIR.mkdir(parents=True, exist_ok=True)
        with tempfile.NamedTemporaryFile(suffix=".so", dir=_BUILD_DIR, delete=False) as tf:
            tmp = tf.name
        # -march=native helps the byte-wise hot loops (~measurable on the
        # bucket-walk compares); fall back to plain -O3 where unsupported
        flag_sets = [["-O3", "-march=native"], ["-O3"]]
        built = False
        for flags in flag_sets:
            cmd = ["cc", *flags, "-shared", "-fPIC", "-o", tmp, str(_SRC)]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
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
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for fn in (lib.fsst_encode, lib.fsst_decode):
        fn.restype = ctypes.c_long
        fn.argtypes = [u8p, u8p, ctypes.c_int, u8p, ctypes.c_long, u8p]
    return lib


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _compile()
    return _lib


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# Per-worker grow-only scratch for encode output.  First-touch page faults
# on multi-MB fresh allocations cost 10-50x the actual kernel time in this
# environment (measured: 6ms decode vs 330ms first-touch for a 23MB chunk);
# a reused scratch faults once per worker process instead of once per chunk.
# Safe to alias: every caller copies the slice out (tobytes / pack_sections)
# before the next call.
_ENC_SCRATCH: np.ndarray | None = None


def _enc_scratch(n: int) -> np.ndarray:
    global _ENC_SCRATCH
    if _ENC_SCRATCH is None or len(_ENC_SCRATCH) < n:
        _ENC_SCRATCH = np.empty(max(n, 1 << 20), np.uint8)
    return _ENC_SCRATCH


def encode(sym_bytes: np.ndarray, sym_lens: np.ndarray, data: bytes) -> bytes:
    """Greedy longest-match FSST encode of `data` with the given table.

    sym_bytes: (n_sym, 8) uint8 (symbols left-justified, zero padded)
    sym_lens:  (n_sym,) uint8 in 1..8
    """
    n = len(data)
    if n == 0:
        return b""
    inp = np.frombuffer(data, np.uint8)
    lib = get_lib()
    if lib is not None:
        out = _enc_scratch(2 * n + 64)  # dual-lane: lane B region at out+n
        m = lib.fsst_encode(
            _u8p(np.ascontiguousarray(sym_bytes)),
            _u8p(np.ascontiguousarray(sym_lens)),
            len(sym_lens), _u8p(inp), n, _u8p(out),
        )
        return out[:m].tobytes()
    return _py_encode(sym_bytes, sym_lens, data)


# Optional decode scratch ring: fresh multi-MB np.empty allocations pay
# first-touch page faults worth 10-50x the decode kernel time in this
# environment (same effect the encode scratch comment documents).  A
# STREAMING consumer that fully processes each decoded chunk before
# advancing (e.g. the verify pipeline) can opt in to a ring of grow-only
# per-worker buffers: each decode takes the next slot, so pages fault once
# per worker, not once per chunk.  CONTRACT: a returned array is valid
# only until the same slot cycles around (`slots` subsequent decodes) —
# holders that outlive that must stay on the default owned-allocation path.
_RING_ON = False
_RING_BUFS: list = []   # persists across ring_scratch blocks: pages fault
_RING_IDX = 0           # once per worker process, not once per block


class ring_scratch:
    """Context manager enabling ring-buffer decode output (see above).
    The slot buffers persist across blocks (grow-only per worker), so a
    task-pool stage that enters the ring once per partition still reuses
    already-faulted pages across partitions."""

    def __init__(self, slots: int = 16):
        self.slots = slots

    def __enter__(self):
        global _RING_ON, _RING_BUFS
        self._prev = _RING_ON
        _RING_ON = True
        if len(_RING_BUFS) < self.slots:
            _RING_BUFS.extend([None] * (self.slots - len(_RING_BUFS)))
        return self

    def __exit__(self, *exc):
        global _RING_ON
        _RING_ON = self._prev
        return False


def _ring_buf(n: int) -> np.ndarray:
    global _RING_IDX
    i = _RING_IDX % len(_RING_BUFS)
    _RING_IDX += 1
    buf = _RING_BUFS[i]
    if buf is None or len(buf) < n:
        buf = _RING_BUFS[i] = np.empty(max(n, 1 << 20), np.uint8)
    return buf


def decode_np(sym_bytes: np.ndarray, sym_lens: np.ndarray, enc,
              out_size: int) -> np.ndarray:
    """Decode into an exactly-sized uint8 array (no extra copy: the caller
    can hand the array to pa.py_buffer zero-copy).  Owned allocation by
    default; inside a `ring_scratch` block the backing memory is a reused
    ring slot (see contract above)."""
    if len(enc) == 0:
        return np.zeros(0, np.uint8)
    inp = np.frombuffer(enc, np.uint8)
    lib = get_lib()
    if lib is not None:
        if _RING_ON:
            out = _ring_buf(out_size + 8)
        else:
            out = np.empty(out_size + 8, np.uint8)  # +8: memcpy slack
        m = lib.fsst_decode(
            _u8p(np.ascontiguousarray(sym_bytes)),
            _u8p(np.ascontiguousarray(sym_lens)),
            len(sym_lens), _u8p(inp), len(inp), _u8p(out),
        )
        return out[:m]
    return np.frombuffer(_py_decode(sym_bytes, sym_lens, bytes(enc)), np.uint8)


def decode(sym_bytes: np.ndarray, sym_lens: np.ndarray, enc: bytes, out_size: int) -> bytes:
    return decode_np(sym_bytes, sym_lens, enc, out_size).tobytes()


# ---------------------------------------------------------------------------
# Pure-Python reference implementations (correctness oracle for the C path)
# ---------------------------------------------------------------------------


# Inputs >= this size encode as two halves (C kernel's dual-lane scheme;
# keep in sync with DUAL_MIN in fsst_kernel.c)
_DUAL_MIN = 4096


_NLANE = 2  # keep in sync with NLANE in fsst_kernel.c


def _py_encode(sym_bytes: np.ndarray, sym_lens: np.ndarray, data: bytes) -> bytes:
    if len(data) >= _DUAL_MIN:
        # mirror of the C kernel's lane split (no recursion): encode each
        # quarter as an independent span — matches cannot cross boundaries
        q = len(data) // _NLANE
        cuts = [L * q for L in range(_NLANE)] + [len(data)]
        return b"".join(
            _py_encode_span(sym_bytes, sym_lens, data[cuts[L]:cuts[L + 1]])
            for L in range(_NLANE))
    return _py_encode_span(sym_bytes, sym_lens, data)


def _py_encode_span(sym_bytes: np.ndarray, sym_lens: np.ndarray, data: bytes) -> bytes:
    by_len: dict[int, dict[bytes, int]] = {}
    byte_code: dict[int, int] = {}
    max_len = 1
    for code, (row, ln) in enumerate(zip(sym_bytes, sym_lens)):
        ln = int(ln)
        sym = bytes(row[:ln])
        if ln == 1:
            byte_code[sym[0]] = code
        else:
            by_len.setdefault(ln, {})[sym] = code
            max_len = max(max_len, ln)
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        matched = False
        for ln in range(min(max_len, n - i), 1, -1):
            tbl = by_len.get(ln)
            if tbl is None:
                continue
            c = tbl.get(data[i : i + ln])
            if c is not None:
                out.append(c)
                i += ln
                matched = True
                break
        if not matched:
            b = data[i]
            c1 = byte_code.get(b)
            if c1 is not None:
                out.append(c1)
            else:
                out.append(ESCAPE)
                out.append(b)
            i += 1
    return bytes(out)


def _py_decode(sym_bytes: np.ndarray, sym_lens: np.ndarray, enc: bytes) -> bytes:
    syms = [bytes(row[: int(ln)]) for row, ln in zip(sym_bytes, sym_lens)]
    out = bytearray()
    i, n = 0, len(enc)
    while i < n:
        c = enc[i]
        if c == ESCAPE:
            i += 1
            out.append(enc[i])
        else:
            out += syms[c]
        i += 1
    return bytes(out)
