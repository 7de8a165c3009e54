"""Document chunking (context-window packing): planted cases, the DuckDB
oracle mirror, overlap mode vs a naive Python mirror, batch invariance."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nem_mms_ray.ops.chunking import chunk_batch, chunk_documents

SF_DIR = "/root/testdata/sf0.001"


def _naive(texts, max_tokens, stride):
    out = []
    for i, s in enumerate(texts):
        ws = (s or "").split()
        start = 0
        cid = 0
        while ws and start < len(ws):
            win = ws[start:start + max_tokens]
            out.append((i, cid, " ".join(win), len(win)))
            if start + max_tokens >= len(ws):
                break
            start += stride
            cid += 1
    return out


def test_chunk_planted():
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array(["a b c d e f g", "x y", "", None],
                                   pa.string())})
    got = chunk_batch(t, max_tokens=3).to_pylist()
    assert got == [
        {"doc_id": 0, "chunk_id": 0, "text": "a b c", "n_tokens": 3},
        {"doc_id": 0, "chunk_id": 1, "text": "d e f", "n_tokens": 3},
        {"doc_id": 0, "chunk_id": 2, "text": "g", "n_tokens": 1},
        {"doc_id": 1, "chunk_id": 0, "text": "x y", "n_tokens": 2},
    ]
    # exactly max_tokens -> one full window, no empty tail
    one = chunk_batch(pa.table({"doc_id": pa.array([7], pa.int64()),
                                "text": pa.array(["a b c"])}), max_tokens=3)
    assert one.to_pylist() == [
        {"doc_id": 7, "chunk_id": 0, "text": "a b c", "n_tokens": 3}]
    with pytest.raises(ValueError, match="stride"):
        chunk_batch(t, max_tokens=3, stride=4)


def test_chunk_overlap_matches_naive():
    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{j}" for j in rng.integers(0, 50, n))
             for n in rng.integers(0, 40, 80)] + ["", None, "solo"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    for mt, st in [(8, 8), (8, 4), (8, 1), (5, 3)]:
        got = [(r["doc_id"], r["chunk_id"], r["text"], r["n_tokens"])
               for r in chunk_batch(t, max_tokens=mt, stride=st).to_pylist()]
        assert got == _naive(texts, mt, st), (mt, st)


def test_chunk_matches_duckdb(ray_session):
    """chunk_documents(max_tokens=7) over sf0.001 documents must equal the
    DuckDB list-slice mirror frame-for-frame (pytest-level oracle — the
    driver report caps at 50 queries)."""
    import ray.data as rd

    got = (chunk_documents(
        rd.read_parquet(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"]), max_tokens=7)
        .to_pandas().sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True))

    con = duckdb.connect()
    want = con.sql(f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(coalesce(text, ''),
                                                     '\\s+'),
                               x -> x <> '') AS ws
            FROM read_parquet('{SF_DIR}/documents.parquet')
        ), c AS (
            SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0
        ), x AS (
            SELECT doc_id, ws, n,
                   unnest(range(0, CAST(ceil(greatest(n - 7, 0) / 7.0)
                                        AS BIGINT) + 1)) AS chunk_id
            FROM c
        )
        SELECT doc_id, chunk_id,
               array_to_string(ws[chunk_id*7 + 1 : least(chunk_id*7 + 7, n)],
                               ' ') AS text,
               least(7, n - chunk_id*7) AS n_tokens
        FROM x ORDER BY doc_id, chunk_id
    """).df()

    assert len(got) == len(want) and len(got) > 500
    for c in ("doc_id", "chunk_id", "n_tokens"):
        assert got[c].tolist() == want[c].astype(int).tolist(), c
    assert got["text"].tolist() == want["text"].tolist()


def test_chunk_batch_invariant(ray_session):
    """Windows depend only on each doc's own tokens: repartitioning the
    input must not change the output."""
    import ray.data as rd

    texts = [" ".join(f"d{i}w{j}" for j in range(i % 23)) for i in range(60)]
    t = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                  "text": pa.array(texts)})
    a = (chunk_documents(rd.from_arrow(t), max_tokens=5)
         .to_pandas().sort_values(["doc_id", "chunk_id"])
         .reset_index(drop=True))
    b = (chunk_documents(rd.from_arrow(t).repartition(13), max_tokens=5)
         .to_pandas().sort_values(["doc_id", "chunk_id"])
         .reset_index(drop=True))
    assert a.equals(b)


from hypothesis import given, settings, strategies as st

_texts = st.lists(
    st.one_of(st.none(),
              st.text(alphabet=" \t\nabZ0é世", max_size=60)),
    max_size=25)


@settings(max_examples=60, deadline=None)
@given(texts=_texts, mt=st.integers(1, 9), frac=st.integers(1, 9))
def test_chunk_property_matches_naive(texts, mt, frac):
    """Any (texts, max_tokens, stride) config matches the naive Python
    mirror — including unicode, tabs/newlines, null and empty docs."""
    stride = max(1, min(mt, frac))
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = [(r["doc_id"], r["chunk_id"], r["text"], r["n_tokens"])
           for r in chunk_batch(t, max_tokens=mt, stride=stride).to_pylist()]
    assert got == _naive(texts, mt, stride)


def test_chunk_overlap_matches_duckdb(ray_session):
    """Overlap mode (stride < max_tokens) vs the DuckDB list-slice mirror
    with an explicit stride in the window range."""
    import ray.data as rd

    mt, stv = 10, 4
    got = (chunk_documents(
        rd.read_parquet(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"]),
        max_tokens=mt, stride=stv)
        .to_pandas().sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True))

    con = duckdb.connect()
    want = con.sql(f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(coalesce(text, ''),
                                                     '\\s+'),
                               x -> x <> '') AS ws
            FROM read_parquet('{SF_DIR}/documents.parquet')
        ), c AS (
            SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0
        ), x AS (
            SELECT doc_id, ws, n,
                   unnest(range(0, CAST(ceil(greatest(n - {mt}, 0) / {stv}.0)
                                        AS BIGINT) + 1)) AS chunk_id
            FROM c
        )
        SELECT doc_id, chunk_id,
               array_to_string(
                   ws[chunk_id*{stv} + 1 :
                      least(chunk_id*{stv} + {mt}, n)], ' ') AS text,
               least({mt}, n - chunk_id*{stv}) AS n_tokens
        FROM x ORDER BY doc_id, chunk_id
    """).df()
    assert len(got) == len(want) > 800
    for c in ("doc_id", "chunk_id", "n_tokens"):
        assert got[c].tolist() == want[c].astype(int).tolist(), c
    assert got["text"].tolist() == want["text"].tolist()


def test_chunks_encode_roundtrip(ray_session, tmp_path):
    """Composition: chunk -> parquet -> codec encode -> bit-identical
    verify.  The chunk fan-out's output is a first-class encode input."""
    import glob

    import ray.data as rd

    from nem_mms_ray.pipelines.decode import verify_files
    from nem_mms_ray.pipelines.encode import encode_files

    chunks_dir = tmp_path / "chunks"
    chunk_documents(
        rd.read_parquet(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"]),
        max_tokens=32).write_parquet(str(chunks_dir))
    paths = sorted(glob.glob(str(chunks_dir / "*.parquet")))
    enc = tmp_path / "enc"
    m = encode_files(paths, enc, target_bytes=1 << 20).to_pandas()
    assert m["rows"].sum() > 1000
    v = verify_files(paths, enc, target_bytes=1 << 20).to_pandas()
    assert bool(v["ok"].all())
