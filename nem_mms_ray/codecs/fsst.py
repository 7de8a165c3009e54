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
TRAIN_SAMPLE_BYTES = 1 << 16  # 64 KiB — FSST trains well on small samples
# (measured on the FIXTURES webtable: 64K/3-gen matches 128K/3-gen ratio
# within 1% at half the training cost; 2-gen loses 15-30% ratio on html)
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


def train_symbols(
    sample: bytes,
    max_symbols: int = MAX_SYMBOLS,
    generations: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic multi-generation training (FSST paper: iterate, counting
    on the previous generation's code boundaries and merging adjacent
    symbols).  Generation 1 ranks raw 1..8-grams; each later generation
    encodes the sample with the current table and re-ranks {existing symbols
    by realized usage} ∪ {concatenations of adjacent code pairs} ∪ {escaped
    bytes}.  All ties break on (length, value) so any parallelism level
    builds the identical table from the same sample (SURVEY.md §7.4)."""
    table = _train_gen1(sample, max_symbols)
    for _ in range(max(0, generations - 1)):
        refined = _refine(sample, table, max_symbols)
        if refined is None:
            break
        table = refined
    return table


def _train_gen1(sample: bytes, max_symbols: int = MAX_SYMBOLS) -> tuple[np.ndarray, np.ndarray]:
    """Generation-1 candidate ranking over raw grams."""
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


def _item_sequence(enc: np.ndarray, sym_vals: np.ndarray, sym_lens_i: np.ndarray):
    """Decode an encoded stream into its item sequence (vals, lens) where an
    item is either a symbol code or an escaped literal byte.

    The escape parse is inherently sequential (a literal may itself be 0xFF)
    but vectorizes via run-parity: inside each maximal run of 0xFF bytes
    that starts at an item boundary, even offsets are escapes and odd
    offsets are their literals; the byte after an odd-length run is also a
    literal.
    """
    n = len(enc)
    is_ff = enc == np.uint8(native.ESCAPE)
    literal = np.zeros(n, bool)
    if is_ff.any():
        # starts of maximal 0xFF runs
        d = np.diff(is_ff.astype(np.int8), prepend=0)
        run_starts = np.flatnonzero(d == 1)
        run_ends = np.flatnonzero(np.diff(is_ff.astype(np.int8), append=0) == -1)
        for s, e in zip(run_starts, run_ends):  # runs are rare; loop is small
            k = e - s + 1
            # within run: s+1, s+3, ... are literals
            literal[s + 1 : e + 1 : 2] = True
            if k % 2 == 1 and e + 1 < n:  # trailing escape consumes next byte
                literal[e + 1] = True
    items = ~literal
    codes = enc[items]
    esc = codes == np.uint8(native.ESCAPE)
    # literal byte following each escape item
    item_pos = np.flatnonzero(items)
    lit_vals = np.zeros(len(codes), np.uint64)
    if esc.any():
        nxt = item_pos[esc] + 1
        nxt = np.clip(nxt, 0, n - 1)
        lit_vals[esc] = enc[nxt].astype(np.uint64)
    vals = np.where(esc, lit_vals, sym_vals[np.minimum(codes, len(sym_vals) - 1)])
    lens = np.where(esc, 1, sym_lens_i[np.minimum(codes, len(sym_lens_i) - 1)])
    return vals.astype(np.uint64), lens.astype(np.int64), esc


def _refine(sample: bytes, table, max_symbols: int):
    """One refinement generation: re-rank on realized usage + merged pairs."""
    sym_bytes, sym_lens = table
    if len(sym_lens) == 0 or len(sample) == 0:
        return None
    sample = take_sample(sample)
    enc = np.frombuffer(native.encode(sym_bytes, sym_lens, sample), np.uint8)
    if len(enc) == 0:
        return None
    # big-endian packed value of each symbol
    shifts = (sym_lens.astype(np.int64)[:, None] - 1 - np.arange(8)[None, :]) * 8
    valid = shifts >= 0
    sym_vals = (
        (sym_bytes.astype(np.uint64) << np.where(valid, shifts, 0).astype(np.uint64))
        * valid
    ).sum(axis=1, dtype=np.uint64)
    vals, lens, esc = _item_sequence(enc, sym_vals, sym_lens.astype(np.int64))

    rec = np.empty(len(vals), dtype=[("v", "u8"), ("l", "i8")])
    rec["v"], rec["l"] = vals, lens
    # existing symbols + escaped bytes by realized usage
    u1, c1 = np.unique(rec, return_counts=True)
    gain1 = c1 * np.maximum(1, u1["l"] - 1)
    gain1 = np.where(u1["l"] == 1, c1, gain1)  # single byte: 1 saved vs escape
    # adjacent pairs with combined length <= 8
    pv = (vals[:-1] << (np.uint64(8) * lens[1:].astype(np.uint64))) | vals[1:]
    pl = lens[:-1] + lens[1:]
    ok = pl <= 8
    rec2 = np.empty(int(ok.sum()), dtype=rec.dtype)
    rec2["v"], rec2["l"] = pv[ok], pl[ok]
    u2, c2 = np.unique(rec2, return_counts=True)
    gain2 = c2  # one output byte saved per merged pair occurrence
    keep2 = gain2 >= 4
    u2, gain2 = u2[keep2], gain2[keep2]

    allu = np.concatenate([u1, u2])
    allg = np.concatenate([gain1, gain2])
    # dedupe (a pair may equal an existing symbol): keep max gain per item
    order = np.lexsort((-allg, allu["l"], allu["v"]))
    allu, allg = allu[order], allg[order]
    first = np.ones(len(allu), bool)
    first[1:] = (allu["v"][1:] != allu["v"][:-1]) | (allu["l"][1:] != allu["l"][:-1])
    allu, allg = allu[first], allg[first]

    pick = np.lexsort((allu["v"], allu["l"], -allg))[:max_symbols]
    sel = allu[pick]
    n_sym = len(sel)
    out_bytes = np.zeros((n_sym, 8), np.uint8)
    out_lens = sel["l"].astype(np.uint8)
    sh = (sel["l"][:, None] - 1 - np.arange(8)[None, :]) * 8
    ok_sh = sh >= 0
    out_bytes[ok_sh] = ((sel["v"][:, None] >> np.where(ok_sh, sh, 0).astype(np.uint64))
                        & np.uint64(0xFF))[ok_sh]
    return out_bytes, out_lens


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


def _build_string_array(typ: pa.DataType, lengths: np.ndarray, data) -> pa.Array:
    """data: bytes / memoryview / uint8 ndarray — wrapped zero-copy; the
    py_buffer holds the owner alive, so no tobytes round-trip."""
    big = pa.types.is_large_string(typ) or pa.types.is_large_binary(typ)
    off_t = np.int64 if big else np.int32
    offsets = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.Array.from_buffers(
        typ,
        len(lengths),
        [None, pa.py_buffer(offsets.astype(off_t)), pa.py_buffer(data)],
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
        # fast path: arrow builders give null string slots zero extent
        # (equal offsets), so the raw buffers already match what fill_nulls
        # would produce — skip the full-column copy unless some null slot
        # actually spans bytes (possible after exotic slicing)
        lengths, data = _string_buffers(arr)
        if arr.null_count:
            nulls = dtypes.validity_to_mask(validity, len(arr))
            if lengths[nulls].any():
                lengths, data = _string_buffers(dtypes.fill_nulls(arr))

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
            data = native.decode_np(sym_bytes, sym_lens, stream, ec.params["data_bytes"])
        out = _build_string_array(typ, lengths, data)
        return dtypes.apply_validity(out, ec.validity)


register(FsstCodec())
