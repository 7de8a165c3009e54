"""FSST codec for string/binary columns: learned symbol table + greedy encode.

From the published FSST design (VLDB 2020 paper, see PAPERS.md): at most 255
symbols of 1..8 bytes, escape byte 255 for literals.  Training is a
deterministic numpy pass over a sample; the per-byte encode/decode loops run
in the C kernel (_fsst_native, pure-Python fallback available).

Per BASELINE.json:north_star this is the codec for `url`/`text` (with dict
fallback at low ndv).  The whole chunk's string data buffer is encoded as one
stream (no random access needed inside a chunk); original per-string lengths
are bit-packed so decode rebuilds offsets exactly — giving the bit-identical
round-trip the reference pins in its own round-trip tests
(/root/reference/src/manage/state.rs:155-191).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nem_mms_ray import dtypes
from nem_mms_ray.codecs import _fsst_native as native
from nem_mms_ray.codecs.base import Codec, EncodedColumn, register
from nem_mms_ray.codecs.bitpack import bit_width, pack_bits, unpack_bits

MAX_SYMBOLS = 255
TRAIN_SAMPLE_BYTES = 1 << 17  # 128 KiB — FSST trains well on small samples
_GRAM_LENGTHS = (2, 3, 4, 5, 6, 8)


def take_sample(data: bytes, cap: int = TRAIN_SAMPLE_BYTES) -> bytes:
    """Deterministic strided sample spread over the whole buffer."""
    if len(data) <= cap:
        return data
    piece = 4096
    k = cap // piece
    stride = len(data) // k
    view = np.frombuffer(data, np.uint8)
    parts = [view[i * stride : i * stride + piece] for i in range(k)]
    return np.concatenate(parts).tobytes()


def train_symbols(sample: bytes, max_symbols: int = MAX_SYMBOLS) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic symbol-table training: rank 1..8-grams by saved bytes.

    Returns (sym_bytes (n,8) uint8 left-justified, sym_lens (n,) uint8).
    Candidate gain: count * (len-1) for multigrams (bytes saved vs coded
    singles), count * 1 for single bytes (coded vs escaped).  Ties broken by
    (length, value) so N-cpu and 4N-cpu runs build identical tables from the
    same sample (SURVEY.md §7.4 determinism requirement).
    """
    sample = take_sample(sample)
    arr = np.frombuffer(sample, np.uint8)
    cand_gain: list[np.ndarray] = []
    cand_len: list[np.ndarray] = []
    cand_val: list[np.ndarray] = []

    counts1 = np.bincount(arr, minlength=256).astype(np.int64)
    present = np.nonzero(counts1)[0]
    cand_gain.append(counts1[present])
    cand_len.append(np.full(len(present), 1, np.int64))
    cand_val.append(present.astype(np.uint64))

    # incremental big-endian packing: vals_L = (vals_{L-1} << 8) | arr[L-1:]
    vals = arr.astype(np.uint64)
    for L in range(2, max(_GRAM_LENGTHS) + 1):
        if len(arr) < L:
            break
        vals = (vals[:-1] << np.uint64(8)) | arr[L - 1 :]
        if L not in _GRAM_LENGTHS:
            continue
        uniq, cnt = np.unique(vals, return_counts=True)
        gain = cnt.astype(np.int64) * (L - 1)
        # keep only candidates that plausibly pay for a code slot
        keep = gain >= max(8, L * 2)
        uniq, gain = uniq[keep], gain[keep]
        if len(uniq) > 4 * max_symbols:  # prune per length before global rank
            order = np.lexsort((uniq, -gain))[: 4 * max_symbols]
            uniq, gain = uniq[order], gain[order]
        cand_gain.append(gain)
        cand_len.append(np.full(len(uniq), L, np.int64))
        cand_val.append(uniq)

    gain = np.concatenate(cand_gain)
    lens = np.concatenate(cand_len)
    vals = np.concatenate(cand_val)
    order = np.lexsort((vals, lens, -gain))[:max_symbols]
    lens, vals = lens[order], vals[order]

    n = len(lens)
    sym_bytes = np.zeros((n, 8), np.uint8)
    shifts = (lens[:, None] - 1 - np.arange(8)[None, :]) * 8
    valid = shifts >= 0
    sym_bytes[valid] = ((vals[:, None] >> np.where(valid, shifts, 0).astype(np.uint64)) & np.uint64(0xFF))[valid]
    return sym_bytes, lens.astype(np.uint8)


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """(lengths int64, concatenated data bytes) of a null-free string array.

    Handles sliced arrays (non-zero offset) without copying the whole buffer.
    """
    bufs = arr.buffers()
    n = len(arr)
    big = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    off_t = np.int64 if big else np.int32
    itemsize = np.dtype(off_t).itemsize
    offsets = np.frombuffer(bufs[1], off_t, count=n + 1, offset=arr.offset * itemsize)
    lengths = np.diff(offsets).astype(np.int64)
    if bufs[2] is None or offsets[-1] == offsets[0]:
        return lengths, b""
    data = np.frombuffer(bufs[2], np.uint8, count=int(offsets[-1]))
    return lengths, data[int(offsets[0]):].tobytes()


def _build_string_array(typ: pa.DataType, lengths: np.ndarray, data: bytes) -> pa.Array:
    big = pa.types.is_large_string(typ) or pa.types.is_large_binary(typ)
    off_t = np.int64 if big else np.int32
    offsets = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.Array.from_buffers(
        typ,
        len(lengths),
        [None, pa.py_buffer(offsets.astype(off_t).tobytes()), pa.py_buffer(data)],
    )


class FsstCodec(Codec):
    name = "fsst"

    def can_encode(self, typ: pa.DataType) -> bool:
        return dtypes.is_string_like(typ)

    def estimate(self, sketch) -> float:
        ratio = sketch.fsst_ratio if sketch.fsst_ratio is not None else 0.6
        len_w = bit_width(sketch.max_len or 0)
        return sketch.value_bytes * ratio + sketch.n * len_w / 8 + 2300

    def encode(
        self,
        arr: pa.Array,
        symbols: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> EncodedColumn:
        """Encode; `symbols` lets a stateful stage train the table once per
        partition and reuse it across batches (SURVEY.md §2.4 ST-target row)."""
        typ = arr.type
        validity = dtypes.extract_validity(arr)
        filled = dtypes.fill_nulls(arr)
        lengths, data = _string_buffers(filled)

        max_len = int(lengths.max()) if len(lengths) else 0
        len_width = bit_width(max_len)
        lengths_packed = pack_bits(lengths.astype(np.uint64), len_width)

        raw = False
        if len(data) == 0:
            sym_bytes = np.zeros((0, 8), np.uint8)
            sym_lens = np.zeros(0, np.uint8)
            stream = b""
        else:
            sym_bytes, sym_lens = symbols if symbols is not None else train_symbols(data)
            stream = native.encode(sym_bytes, sym_lens, data)
            if len(stream) >= len(data):  # incompressible: store raw
                raw = True
                stream = data
        payload = dtypes.pack_sections(
            sym_lens.tobytes(), sym_bytes.tobytes(), stream, lengths_packed
        )
        return EncodedColumn(
            codec=self.name,
            n=len(arr),
            dtype=dtypes.type_to_str(typ),
            payload=payload,
            validity=validity,
            params={
                "raw": raw,
                "len_width": len_width,
                "data_bytes": int(len(data)),
                "n_sym": int(len(sym_lens)),
            },
        )

    def decode(self, ec: EncodedColumn) -> pa.Array:
        typ = dtypes.type_from_str(ec.dtype)
        sym_lens_b, sym_bytes_b, stream, lengths_packed = dtypes.unpack_sections(ec.payload)
        lengths = unpack_bits(lengths_packed, ec.n, ec.params["len_width"]).astype(np.int64)
        if ec.params["raw"]:
            data = stream
        else:
            n_sym = ec.params["n_sym"]
            sym_lens = np.frombuffer(sym_lens_b, np.uint8, count=n_sym)
            sym_bytes = np.frombuffer(sym_bytes_b, np.uint8, count=n_sym * 8).reshape(n_sym, 8)
            data = native.decode(sym_bytes, sym_lens, stream, ec.params["data_bytes"])
        out = _build_string_array(typ, lengths, data)
        return dtypes.apply_validity(out, ec.validity)


register(FsstCodec())
