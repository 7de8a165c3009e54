"""Width-minimal bit packing + frame-of-reference codec for integer-like types.

Used directly as the `for` codec on int/timestamp/date columns (e.g. the
`warc_ts` epoch-micros column per BASELINE.json:north_star), and as the shared
index/length packer inside dict, rle and fsst.

The decode side must reproduce values bit-identically including the
reference's checked-narrowing semantics (/root/reference/src/flatfile.rs:573-587):
we never change the logical type, only the physical width of the deltas.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nem_mms_ray import dtypes
from nem_mms_ray.codecs.base import Codec, EncodedColumn, register


def bit_width(max_delta: int) -> int:
    """Bits needed for values in [0, max_delta]."""
    return int(max_delta).bit_length() if max_delta > 0 else 0


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative uint64 values into `width`-bit little-endian fields."""
    if width == 0 or len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of pack_bits -> uint64 ndarray of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, np.uint8), count=n * width, bitorder="little"
    ).reshape(n, width)
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)


def _int_values(arr: pa.Array) -> np.ndarray:
    """Null-free integer view of an int-like array as int64 (or uint64)."""
    ivt = dtypes.int_view_type(arr.type)
    dense = arr if arr.type.equals(ivt) else arr.view(ivt)
    v = np.asarray(dense)
    return v


class ForBitpackCodec(Codec):
    """Frame-of-reference + bit-pack: payload = pack_bits(v - min, width)."""

    name = "for"

    def can_encode(self, typ: pa.DataType) -> bool:
        return dtypes.is_int_like(typ)

    def estimate(self, sketch) -> float:
        if sketch.int_range is None:
            return float("inf")
        w = bit_width(sketch.int_range)
        return sketch.n * w / 8 + 32

    def encode(self, arr: pa.Array) -> EncodedColumn:
        typ = arr.type
        validity = dtypes.extract_validity(arr)
        filled = dtypes.fill_nulls(arr)
        v = _int_values(filled)
        unsigned = v.dtype.kind == "u"
        work = v.astype(np.uint64) if unsigned else v.astype(np.int64)
        if len(work):
            base = int(work.min())
            # two's-complement subtraction wraps correctly for signed bases
            deltas = work.astype(np.uint64) - np.uint64(base & 0xFFFFFFFFFFFFFFFF)
            # extract the common divisor: day-aligned timestamps, cents,
            # quantized sensor steps etc. pack log2(div) fewer bits/value
            div = int(np.gcd.reduce(deltas)) if deltas.any() else 1
            if div > 1:
                deltas = deltas // np.uint64(div)
            width = bit_width(int(deltas.max()))
        else:
            base, deltas, width, div = 0, np.zeros(0, np.uint64), 0, 1
        payload = pack_bits(deltas, width)
        return EncodedColumn(
            codec=self.name,
            n=len(arr),
            dtype=dtypes.type_to_str(typ),
            payload=payload,
            validity=validity,
            params={"base": base, "width": width, "div": div},
        )

    def decode(self, ec: EncodedColumn) -> pa.Array:
        typ = dtypes.type_from_str(ec.dtype)
        deltas = unpack_bits(ec.payload, ec.n, ec.params["width"])
        div = int(ec.params.get("div", 1))
        if div > 1:
            deltas = deltas * np.uint64(div)  # wraps mod 2^64 (inverse exact)
        base = int(ec.params["base"])
        raw = deltas + np.uint64(base & 0xFFFFFFFFFFFFFFFF)  # wraps mod 2^64
        ivt = dtypes.int_view_type(typ)
        np_t = np.dtype(str(ivt) if pa.types.is_integer(ivt) else "int64")
        v = raw.astype(np.int64).astype(np_t) if np_t.kind == "i" else raw.astype(np_t)
        out = pa.array(v, type=ivt)
        if not typ.equals(ivt):
            out = out.view(typ)
        return dtypes.apply_validity(out, ec.validity)


class BitpackCodec(ForBitpackCodec):
    """Plain width-minimal bit-pack (no frame of reference): payload =
    pack_bits(v, width from the max value).  Only competitive when values
    are small non-negative ints already near zero (flags, small enums);
    `for` strictly dominates otherwise, so the estimate prices the wider
    zero-based width honestly and the selector picks whichever wins."""

    name = "bitpack"

    def estimate(self, sketch) -> float:
        if sketch.int_min is None or sketch.int_max is None or sketch.int_min < 0:
            return float("inf")
        return sketch.n * bit_width(sketch.int_max) / 8 + 24

    def encode(self, arr: pa.Array) -> EncodedColumn:
        typ = arr.type
        validity = dtypes.extract_validity(arr)
        filled = dtypes.fill_nulls(arr)
        v = _int_values(filled)
        work = v.astype(np.uint64)
        if len(work) and v.dtype.kind == "i" and (v < 0).any():
            raise ValueError("bitpack codec requires non-negative values")
        width = bit_width(int(work.max())) if len(work) else 0
        return EncodedColumn(
            codec=self.name,
            n=len(arr),
            dtype=dtypes.type_to_str(typ),
            payload=pack_bits(work, width),
            validity=validity,
            params={"base": 0, "width": width},
        )


class DeltaBitpackCodec(Codec):
    """Delta + frame-of-reference-on-deltas + bit-pack (the
    DELTA_BINARY_PACKED family): ideal for near-monotone sequences like
    crawl timestamps, where consecutive deltas span a far narrower range
    than the values themselves.  All arithmetic wraps mod 2^64 so any int64
    sequence round-trips exactly."""

    name = "delta"

    def can_encode(self, typ: pa.DataType) -> bool:
        return dtypes.is_int_like(typ)

    def estimate(self, sketch) -> float:
        if sketch.delta_width is None:
            return float("inf")
        return sketch.n * sketch.delta_width / 8 + 48

    def encode(self, arr: pa.Array) -> EncodedColumn:
        typ = arr.type
        validity = dtypes.extract_validity(arr)
        filled = dtypes.fill_nulls(arr)
        v = _int_values(filled).astype(np.uint64)
        if len(v):
            first = int(v[0])
            deltas = np.diff(v)  # wraps mod 2^64
            if len(deltas):
                min_d = int(deltas.min())
                rel = deltas - np.uint64(min_d)
                div = int(np.gcd.reduce(rel)) if rel.any() else 1
                if div > 1:
                    rel = rel // np.uint64(div)
                width = bit_width(int(rel.max()))
            else:
                min_d, rel, width, div = 0, np.zeros(0, np.uint64), 0, 1
        else:
            first, min_d, rel, width, div = 0, 0, np.zeros(0, np.uint64), 0, 1
        return EncodedColumn(
            codec=self.name,
            n=len(arr),
            dtype=dtypes.type_to_str(typ),
            payload=pack_bits(rel, width),
            validity=validity,
            params={"first": first, "min_delta": min_d, "width": width, "div": div},
        )

    def decode(self, ec: EncodedColumn) -> pa.Array:
        typ = dtypes.type_from_str(ec.dtype)
        n = ec.n
        if n == 0:
            vals = np.zeros(0, np.uint64)
        else:
            rel = unpack_bits(ec.payload, n - 1, ec.params["width"])
            div = int(ec.params.get("div", 1))
            if div > 1:
                rel = rel * np.uint64(div)
            deltas = rel + np.uint64(ec.params["min_delta"] & 0xFFFFFFFFFFFFFFFF)
            vals = np.empty(n, np.uint64)
            vals[0] = np.uint64(ec.params["first"] & 0xFFFFFFFFFFFFFFFF)
            if n > 1:
                np.cumsum(deltas, out=deltas)  # wraps mod 2^64
                vals[1:] = vals[0] + deltas
        ivt = dtypes.int_view_type(typ)
        np_t = np.dtype(str(ivt)) if pa.types.is_integer(ivt) else np.dtype("int64")
        v = vals.astype(np.int64).astype(np_t) if np_t.kind == "i" else vals.astype(np_t)
        out = pa.array(v, type=ivt)
        if not typ.equals(ivt):
            out = out.view(typ)
        return dtypes.apply_validity(out, ec.validity)


register(ForBitpackCodec())
register(BitpackCodec())
register(DeltaBitpackCodec())
