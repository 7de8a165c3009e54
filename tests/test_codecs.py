"""Per-codec round-trip tests over adversarial arrays (FIXTURES.md F2).

The analog of the reference's exact-equality parse tests
(/root/reference/src/flatfile.rs:644-773) and its render/parse round-trip
idiom (/root/reference/src/manage/state.rs:155-191): decode(encode(col))
must equal col exactly, including null positions and empty-vs-null strings.
"""

import numpy as np
import pyarrow as pa
import pytest

from nem_mms_ray.codecs import REGISTRY, decode_column, get_codec
from nem_mms_ray.codecs import _fsst_native as native
from nem_mms_ray.codecs.bitpack import bit_width, pack_bits, unpack_bits
from nem_mms_ray.codecs.fsst import train_symbols

INT_ARRAYS = [
    pa.array([], type=pa.int64()),
    pa.array([None, None], type=pa.int64()),
    pa.array([7], type=pa.int64()),
    pa.array([5] * 100, type=pa.int64()),
    pa.array(range(1000), type=pa.int64()),
    pa.array([0, -1, 2**62, -(2**62), None], type=pa.int64()),
    pa.array([2**63 - 1, -(2**63), 0], type=pa.int64()),
    pa.array([2**64 - 1, 0, 12345], type=pa.uint64()),
    pa.array([-128, 127, None, 0], type=pa.int8()),
    pa.array([None, -32768, 32767], type=pa.int16()),
    pa.array(np.arange(500)[::-1].copy() * 1000003, type=pa.int64()),  # unsorted-ish
    pa.array((np.arange(300) * 86400_000_000 + 1_600_000_000_000_000), type=pa.timestamp("us")),
    pa.array([-10**15, 10**15, None], type=pa.timestamp("s")),
    pa.array([0, 1, 2], type=pa.date32()),
]

STRING_ARRAYS = [
    pa.array([], type=pa.string()),
    pa.array([None, None], type=pa.string()),
    pa.array([""], type=pa.string()),
    pa.array(["", None, "x", "", None]),  # empty-vs-null distinction
    pa.array(["same"] * 200),
    pa.array([f"distinct-{i}" for i in range(500)]),
    pa.array(["café", "naïve", "中文", "\U0001F600", ""] * 40),
    pa.array(["run"] * 50 + ["alt", "run"] * 50 + [None] * 10),
    pa.array([b"", b"\x00\xff\xfe", None, bytes(range(256)) * 4], type=pa.binary()),
    pa.array([b"large" * 100, None, b""], type=pa.large_binary()),
    pa.array(["large_string test", None, ""], type=pa.large_string()),
]

OTHER_ARRAYS = [
    pa.array([1.5, None, -0.0, float("inf"), float("-inf")], type=pa.float64()),
    pa.array([float("nan"), 1.0, None], type=pa.float64()),
    pa.array([True, False, None, True] * 25),
    pa.array([1.5, 2.5], type=pa.float32()),
]


def _roundtrip(codec_name, arr):
    codec = get_codec(codec_name)
    if not codec.can_encode(arr.type):
        pytest.skip(f"{codec_name} cannot encode {arr.type}")
    ec = codec.encode(arr)
    out = decode_column(ec)
    assert out.type.equals(arr.type), (codec_name, arr.type, out.type)
    # NaN-aware equality: arrow equals treats NaN != NaN, compare via pylist
    if pa.types.is_floating(arr.type):
        a, b = arr.to_pylist(), out.to_pylist()
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert (x is None) == (y is None)
            if x is not None:
                assert (x != x and y != y) or x == y or (repr(x) == repr(y))
    else:
        assert out.equals(arr), (codec_name, arr.to_pylist()[:10], out.to_pylist()[:10])
    # null positions preserved bit-exactly
    assert out.null_count == arr.null_count


@pytest.mark.parametrize("codec", ["plain", "for", "delta", "dict", "rle"])
@pytest.mark.parametrize("i", range(len(INT_ARRAYS)))
def test_int_roundtrip(codec, i):
    _roundtrip(codec, INT_ARRAYS[i])


@pytest.mark.parametrize("i", range(len(INT_ARRAYS)))
def test_bitpack_roundtrip(i):
    """Plain bit-pack: non-negative domain only (the selector estimates it
    as inf below zero, and encode() refuses; pipeline falls back to plain)."""
    import pyarrow.compute as pc

    from nem_mms_ray import dtypes as _dt

    arr = INT_ARRAYS[i]
    iv = arr if pa.types.is_integer(arr.type) else arr.view(_dt.int_view_type(arr.type))
    mn = pc.min(iv).as_py() if len(arr) else None
    if mn is not None and int(mn) < 0:
        with pytest.raises(ValueError):
            get_codec("bitpack").encode(arr)
        return
    _roundtrip("bitpack", arr)


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "fsst"])
@pytest.mark.parametrize("i", range(len(STRING_ARRAYS)))
def test_string_roundtrip(codec, i):
    _roundtrip(codec, STRING_ARRAYS[i])


@pytest.mark.parametrize("codec", ["plain", "dict", "rle"])
@pytest.mark.parametrize("i", range(len(OTHER_ARRAYS)))
def test_other_roundtrip(codec, i):
    _roundtrip(codec, OTHER_ARRAYS[i])


def test_sliced_array_roundtrip():
    base = pa.array(["pad", "a", "bb", None, "", "ccc", "tail"])
    sl = base.slice(1, 5)
    for codec in ("plain", "dict", "rle", "fsst"):
        ec = get_codec(codec).encode(sl)
        assert decode_column(ec).equals(pa.concat_arrays([sl]))


@pytest.mark.parametrize("width", [0, 1, 7, 8, 9, 31, 32, 33, 63, 64])
def test_bitpack_widths(width):
    n = 257
    rng = np.random.default_rng(width + 1)
    if width == 0:
        vals = np.zeros(n, np.uint64)
    elif width == 64:
        vals = rng.integers(0, 2**63, n).astype(np.uint64) * 2 + (rng.integers(0, 2, n).astype(np.uint64))
    else:
        vals = rng.integers(0, 2**width, n).astype(np.uint64)
    buf = pack_bits(vals, width)
    out = unpack_bits(buf, n, width)
    assert np.array_equal(out, vals)
    assert len(buf) == (n * width + 7) // 8


def test_bit_width():
    assert bit_width(0) == 0
    assert bit_width(1) == 1
    assert bit_width(255) == 8
    assert bit_width(256) == 9


def test_fsst_c_matches_python_reference():
    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 256, 2000, dtype=np.uint8)) + b"abcabcabc" * 200
    syms = train_symbols(data)
    enc_c = native.encode(*syms, data)
    enc_py = native._py_encode(*syms, data)
    assert enc_c == enc_py
    assert native._py_decode(*syms, enc_c) == data
    assert native.decode(*syms, enc_c, len(data)) == data


def test_fsst_escape_byte_in_data():
    # 0xFF is the escape byte; data full of it must survive
    data = b"\xff" * 100 + b"ab\xffcd" * 50
    syms = train_symbols(data)
    enc = native.encode(*syms, data)
    assert native.decode(*syms, enc, len(data)) == data


def test_fsst_deterministic_training():
    data = b"the quick brown fox " * 500
    s1 = train_symbols(data)
    s2 = train_symbols(data)
    assert np.array_equal(s1[0], s2[0]) and np.array_equal(s1[1], s2[1])


def test_registry_complete():
    assert set(REGISTRY) >= {"plain", "for", "dict", "rle", "fsst"}


def test_compression_beats_plain_on_favorable_data():
    lang = pa.array(["en"] * 900 + ["fr"] * 80 + ["de"] * 20)
    plain = get_codec("plain").encode(lang).encoded_bytes
    assert get_codec("dict").encode(lang).encoded_bytes < plain
    assert get_codec("rle").encode(lang).encoded_bytes < plain
    ts = pa.array(np.arange(10000) * 1000 + 1_700_000_000_000_000, type=pa.timestamp("us"))
    assert get_codec("for").encode(ts).encoded_bytes < get_codec("plain").encode(ts).encoded_bytes / 2


# ---------------------------------------------------------------------------
# ALP decimal-float codec
# ---------------------------------------------------------------------------

ALP_OK_ARRAYS = [
    pa.array([], type=pa.float64()),
    pa.array([None, None], type=pa.float64()),
    pa.array([19.99, 0.01, None, -4.5, 100.0], type=pa.float64()),
    pa.array([1.0, 2.0, 3.0] * 50, type=pa.float64()),          # scale e=0
    pa.array(np.arange(1000) * 0.25, type=pa.float64()),        # e=2
    pa.array([1.5, 2.5, None], type=pa.float32()),
    pa.array([-1234.56, 7890.12], type=pa.float64()),
]


@pytest.mark.parametrize("i", range(len(ALP_OK_ARRAYS)))
def test_alp_roundtrip(i):
    _roundtrip("alp", ALP_OK_ARRAYS[i])


@pytest.mark.parametrize("bad", [
    pa.array([float("nan"), 1.0], type=pa.float64()),
    pa.array([float("inf"), 1.0], type=pa.float64()),
    pa.array([np.pi, 1.0], type=pa.float64()),                  # not decimal
    pa.array([-0.0, 1.0], type=pa.float64()),                   # -0.0 bit lost
    pa.array([1e17, 1.0], type=pa.float64()),                   # > 2^53
])
def test_alp_refuses_non_decimal(bad):
    with pytest.raises(ValueError):
        get_codec("alp").encode(bad)


def test_alp_selector_picks_it_for_prices():
    from nem_mms_ray.selector import select_codec
    from nem_mms_ray.stats import sketch_array

    rng = np.random.default_rng(3)
    prices = pa.array(np.round(rng.uniform(1, 100000, 20000), 2))
    plan = select_codec(sketch_array("price", prices))
    assert plan.codec == "alp"
    # and the estimate is honest: ~ n * width/8 for range 1e7 (24 bits)
    assert plan.estimates["alp"] < plan.estimates["plain"] / 2


def test_alp_sketch_merge_invariance():
    from nem_mms_ray.stats import merge_sketches, sketch_array

    vals = pa.array([1.25, 3.5, None, 100.75, 2.0] * 200)
    whole = sketch_array("x", vals, with_fsst_probe=False)
    parts = [sketch_array("x", vals.slice(i * 250, 250), with_fsst_probe=False)
             for i in range(4)]
    merged = merge_sketches(parts)
    assert merged.float_scale == whole.float_scale == 2
    assert merged.f_min == whole.f_min and merged.f_max == whole.f_max
    # a non-decimal part poisons the merge
    bad = sketch_array("x", pa.array([np.pi]), with_fsst_probe=False)
    assert merge_sketches(parts + [bad]).float_scale is None


def test_ipc_fallback_roundtrips_nested_types():
    """The universal fallback must round-trip types no typed codec covers."""
    arrays = [
        pa.array([[1.5, 2.5], None, [], [0.0]], type=pa.list_(pa.float32())),
        pa.array([{"a": 1, "b": "x"}, None, {"a": 2, "b": None}],
                 type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
        pa.array([[1, 2], [3]], type=pa.list_(pa.int64())),
    ]
    for arr in arrays:
        ec = get_codec("ipc").encode(arr)
        out = decode_column(ec)
        assert out.equals(arr), arr.type
        assert out.null_count == arr.null_count


def test_encode_pipeline_handles_list_columns(tmp_path):
    """A table with a list column encodes via the ipc plan instead of
    aborting (the embeddings-table case)."""
    import pyarrow.parquet as pq

    from nem_mms_ray.pipelines.decode import decode_partition_file
    from nem_mms_ray.pipelines.encode import EncodePartitions, plan_partitions

    t = pa.table({
        "vec_id": pa.array(range(100), pa.int64()),
        "embedding": pa.array([[float(i), i + 0.5] for i in range(100)],
                              type=pa.list_(pa.float32())),
    })
    src = tmp_path / "emb.parquet"
    pq.write_table(t, src)
    specs = plan_partitions([str(src)], target_bytes=1 << 20)
    enc = EncodePartitions(str(tmp_path / "enc"))
    r = enc._encode_partition(specs[0])
    assert r.codecs["embedding"] == "ipc"
    back = decode_partition_file(tmp_path / "enc" / "part-000000.parquet")
    assert back.select(["vec_id", "embedding"]).equals(t)


def test_fsst_dual_lane_boundary_parity():
    """Inputs around the dual-lane threshold (and far above it) must match
    the Python reference byte-for-byte: the C kernel's lane split is
    mirrored by _py_encode, and any drift in the split arithmetic shows up
    here as an output mismatch (round-trip would still pass — decode is
    split-agnostic — so parity is the sharper assertion)."""
    rng = np.random.default_rng(77)
    base = b"the quick brown fox jumps over a lazy dog " * 600
    for n in [4095, 4096, 4097, 8191, 8193, 65537]:
        data = (base * 3 + bytes(rng.integers(0, 256, 4000, dtype=np.uint8)))[:n]
        syms = train_symbols(data)
        enc_c = native.encode(*syms, data)
        assert enc_c == native._py_encode(*syms, data), n
        assert native.decode(*syms, enc_c, len(data)) == data, n


def test_fsst_null_fast_path_and_sliced():
    """Null string slots round-trip through the no-copy path (zero-extent
    offsets), including on sliced arrays with non-zero offset."""
    c = get_codec("fsst")
    arr = pa.array((["hello world the quick brown fox"] * 50
                    + [None, "x", None]) * 40, pa.large_string())
    for a in [arr, arr.slice(7, 1900)]:
        dec = c.decode(c.encode(a))
        assert dec.equals(a)
        assert dec.null_count == a.null_count


def test_fsst_bucket_overflow_parity():
    """Seven symbols whose 3-byte prefixes all hash to ONE kernel bucket
    (hash3 collisions, brute-forced): the AVX2 probe covers only a
    bucket's 4 longest candidates, so matches on the 5th+ entries must
    come from the scalar overflow walk.  Byte-parity with the Python
    reference pins that path; a generic random table never exercises it
    (253 symbols over 2048 buckets make >4-entry buckets vanishingly
    rare)."""
    # all hash to bucket 1900 for hash3(x) = (x * 0x9E3779B1 >> 17) & 2047
    prefixes = [b"aad", b"aks", b"czl", b"ego", b"gvh", b"ick"]
    symbols = [b"aadx"] + prefixes  # len-4 first: exercises longest-first
    rows = np.zeros((len(symbols), 8), np.uint8)
    lens = np.zeros(len(symbols), np.uint8)
    for i, s in enumerate(symbols):
        rows[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    # every symbol appears, including the two that can only match via the
    # overflow walk (bucket order is longest-first then code order, so the
    # SoA slots hold aadx,aad,aks,czl and the walk covers ego,gvh,ick)
    body = b"|".join(symbols) + b" ego gvh ick aadx aad "
    for data in (body * 40, body * 400):  # single-lane and dual-lane sizes
        enc_c = native.encode(rows, lens, data)
        assert enc_c == native._py_encode(rows, lens, data)
        assert native.decode(rows, lens, enc_c, len(data)) == data
