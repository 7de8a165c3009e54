"""Self-compiling ctypes glue for the sorted-set intersection kernel
(`setops_kernel.c`) — same pattern as `ops/_webextract_native.py` /
`codecs/_fsst_native.py`: the shared object builds once per source hash
under /tmp (cc -O3, <1s), every worker process reuses the cached .so,
and a missing compiler degrades to a numpy fallback (identical output,
slower)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("setops_kernel.c")
_BUILD_DIR = Path(tempfile.gettempdir()) / "nem_mms_ray_build"
_LIB: ctypes.CDLL | None = None
_TRIED = False

_u64p = ctypes.POINTER(ctypes.c_uint64)
_i64p = ctypes.POINTER(ctypes.c_int64)


def _compile() -> ctypes.CDLL | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so = _BUILD_DIR / f"setops_{tag}.so"
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
    lib.intersect_count_pairs.restype = ctypes.c_long
    lib.intersect_count_pairs.argtypes = [
        _u64p, _i64p, _i64p, _i64p, ctypes.c_long, ctypes.c_double, _i64p]
    lib.minhash_signatures.restype = ctypes.c_long
    lib.minhash_signatures.argtypes = [
        _u64p, _i64p, ctypes.c_long, _u64p, _u64p, ctypes.c_long, _u64p]
    lib.union_find_minroot.restype = None
    lib.union_find_minroot.argtypes = [
        _i64p, _i64p, ctypes.c_long, _i64p, ctypes.c_long]
    lib.union_find_init.restype = None
    lib.union_find_init.argtypes = [_i64p, ctypes.c_long]
    lib.union_find_edges.restype = None
    lib.union_find_edges.argtypes = [_i64p, _i64p, ctypes.c_long, _i64p]
    lib.union_find_flatten.restype = None
    lib.union_find_flatten.argtypes = [_i64p, ctypes.c_long]
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


def minhash_signatures(sets: list, a: np.ndarray,
                       b: np.ndarray) -> np.ndarray | None:
    """(n_docs, num_perm) uint64 MinHash signatures for a list of uint64
    shingle arrays — one C call for the whole batch, bit-identical to
    ops/dedup._minhash per doc.  None when the kernel is unavailable
    (caller falls back to the per-doc numpy loop)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(sets)
    num_perm = len(a)
    off = np.zeros(n + 1, np.int64)
    if n:
        off[1:] = np.cumsum([len(s) for s in sets])
    vals = (np.ascontiguousarray(np.concatenate(sets), np.uint64)
            if n and off[-1] else np.zeros(0, np.uint64))
    a = np.ascontiguousarray(a, np.uint64)
    b = np.ascontiguousarray(b, np.uint64)
    out = np.empty(n * num_perm, np.uint64)
    lib.minhash_signatures(
        vals.ctypes.data_as(_u64p), off.ctypes.data_as(_i64p),
        ctypes.c_long(n), a.ctypes.data_as(_u64p), b.ctypes.data_as(_u64p),
        ctypes.c_long(num_perm), out.ctypes.data_as(_u64p))
    return out.reshape(n, num_perm)


def intersect_counts(vals: np.ndarray, off: np.ndarray,
                     a_idx: np.ndarray, b_idx: np.ndarray,
                     min_j: float = 0.0) -> np.ndarray:
    """|A_i & B_i| per pair over a flat store of sorted-unique uint64
    sets: set k is vals[off[k]:off[k+1]].  C kernel when available,
    numpy fallback (searchsorted probe of the smaller side into the
    larger) otherwise — identical results.

    min_j > 0 arms the Jaccard early exit (see setops_kernel.c): pairs
    that provably cannot reach jaccard >= min_j report a count UPPER
    BOUND still mapping to j < min_j — exact for every pair at or above
    the threshold, threshold-equivalent below it.  The numpy fallback
    always computes exact counts (exact is a valid instance of the
    bound contract)."""
    n = len(a_idx)
    out = np.empty(n, np.int64)
    if n == 0:
        return out
    vals = np.ascontiguousarray(vals, np.uint64)
    off = np.ascontiguousarray(off, np.int64)
    a_idx = np.ascontiguousarray(a_idx, np.int64)
    b_idx = np.ascontiguousarray(b_idx, np.int64)
    lib = get_lib()
    if lib is not None:
        lib.intersect_count_pairs(
            vals.ctypes.data_as(_u64p), off.ctypes.data_as(_i64p),
            a_idx.ctypes.data_as(_i64p), b_idx.ctypes.data_as(_i64p),
            ctypes.c_long(n), ctypes.c_double(min_j),
            out.ctypes.data_as(_i64p))
        return out
    for i in range(n):
        sa = vals[off[a_idx[i]]:off[a_idx[i] + 1]]
        sb = vals[off[b_idx[i]]:off[b_idx[i] + 1]]
        if len(sa) > len(sb):
            sa, sb = sb, sa
        if len(sa) == 0:
            out[i] = 0
            continue
        pos = np.searchsorted(sb, sa)
        pos[pos == len(sb)] = len(sb) - 1
        out[i] = int((sb[pos] == sa).sum())
    return out


def union_find_minroot(src_codes: np.ndarray, dst_codes: np.ndarray,
                       n_nodes: int) -> np.ndarray | None:
    """parent[i] = min node CODE reachable from i through the edge list
    (codes must be id-sorted, np.unique's output order), or None when the
    C kernel is unavailable (the caller keeps its Python union-find).
    2.37M random edges over 200k nodes: 0.14 s here vs 2.0 s through
    the interpreted loop (identical labels)."""
    lib = get_lib()
    if lib is None or n_nodes == 0:
        return None
    src_codes = np.ascontiguousarray(src_codes, np.int64)
    dst_codes = np.ascontiguousarray(dst_codes, np.int64)
    parent = np.empty(n_nodes, np.int64)
    lib.union_find_minroot(
        src_codes.ctypes.data_as(_i64p), dst_codes.ctypes.data_as(_i64p),
        ctypes.c_long(len(src_codes)), parent.ctypes.data_as(_i64p),
        ctypes.c_long(int(n_nodes)))
    return parent


class StreamingUnionFind:
    """Incremental union-find over STREAMED edge batches (the
    connected-components middle regime): memory is O(nodes), edges are
    consumed batch-by-batch and never held together.  Node ids must be
    pre-mapped to dense codes 0..n_nodes-1 sorted by id (np.unique
    order), so the flattened parent's root is each set's minimum id —
    `union_find_minroot` semantics, batch-wise.  None from the factory
    means no C kernel (caller falls back)."""

    def __init__(self, n_nodes: int, parent: np.ndarray, lib):
        self._lib = lib
        self.parent = parent

    @classmethod
    def create(cls, n_nodes: int) -> "StreamingUnionFind | None":
        lib = get_lib()
        if lib is None:
            return None
        parent = np.empty(int(n_nodes), np.int64)
        lib.union_find_init(parent.ctypes.data_as(_i64p),
                            ctypes.c_long(int(n_nodes)))
        return cls(n_nodes, parent, lib)

    def add_edges(self, src_codes: np.ndarray, dst_codes: np.ndarray) -> None:
        src_codes = np.ascontiguousarray(src_codes, np.int64)
        dst_codes = np.ascontiguousarray(dst_codes, np.int64)
        self._lib.union_find_edges(
            src_codes.ctypes.data_as(_i64p), dst_codes.ctypes.data_as(_i64p),
            ctypes.c_long(len(src_codes)), self.parent.ctypes.data_as(_i64p))

    def flatten(self) -> np.ndarray:
        self._lib.union_find_flatten(self.parent.ctypes.data_as(_i64p),
                                     ctypes.c_long(len(self.parent)))
        return self.parent
