"""Sequence packing: planted next-fit cases, the naive Python mirror, the
DuckDB string_agg oracle for stream mode, losslessness and budget
properties, chunk->pack composition, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from nem_mms_ray.ops.packing import _next_fit_bounds, pack_sequences

SF_DIR = "/root/testdata/sf0.001"


def _naive_next_fit(rows, budget):
    """rows: ordered (text, n_tokens) with n_tokens > 0."""
    packs, cur, tot = [], [], 0
    for text, nt in rows:
        if cur and tot + nt > budget:
            packs.append((" ".join(cur), tot, len(cur)))
            cur, tot = [], 0
        cur.append(text)
        tot += nt
    if cur:
        packs.append((" ".join(cur), tot, len(cur)))
    return packs


def _doc_table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_next_fit_planted(ray_session):
    import ray.data as rd

    # one bucket so the walk order is the doc order
    t = _doc_table(["a b", "c d e", "f", "", None,
                    "x0 x1 x2 x3 x4 x5 x6 x7"])  # 2,3,1,0,0,8 tokens
    got = (pack_sequences(rd.from_arrow(t), budget=5, n_buckets=1)
           .to_pandas().sort_values("pack_id").reset_index(drop=True))
    assert got[["pack_id", "text", "n_tokens", "n_seqs"]].values.tolist() == [
        [0, "a b c d e", 5, 2],          # 2+3 fills the budget exactly
        [1, "f", 1, 1],                  # 1+8 would overflow
        [2, "x0 x1 x2 x3 x4 x5 x6 x7", 8, 1],  # oversized packs alone
    ]
    with pytest.raises(ValueError, match="mode"):
        pack_sequences(rd.from_arrow(t), mode="best_fit")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(rd.from_arrow(t), budget=0)


def test_next_fit_matches_naive(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    texts = [" ".join(f"w{i}_{j}" for j in range(n))
             for i, n in enumerate(rng.integers(0, 30, 200))]
    t = _doc_table(texts)
    for budget, nb in [(17, 4), (64, 3), (5, 1)]:
        got = (pack_sequences(rd.from_arrow(t), budget=budget, n_buckets=nb)
               .to_pandas().sort_values(["bucket", "pack_id"])
               .reset_index(drop=True))
        want = []
        for b in range(nb):
            rows = [(texts[i], len(texts[i].split()))
                    for i in range(len(texts))
                    if i % nb == b and texts[i].split()]
            for pid, (txt, nt, ns) in enumerate(_naive_next_fit(rows, budget)):
                want.append([b, pid, txt, nt, ns])
        assert got.values.tolist() == want, (budget, nb)


def test_next_fit_budget_and_lossless(ray_session):
    """Every pack fits the budget unless it is a single oversized
    sequence, and the bucket's concatenated pack text reproduces its
    input token stream exactly (packing moves text, never edits it)."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    texts = [" ".join(f"t{i}x{j}" for j in range(n))
             for i, n in enumerate(rng.integers(0, 40, 300))]
    t = _doc_table(texts)
    got = (pack_sequences(rd.from_arrow(t), budget=25, n_buckets=8)
           .to_pandas().sort_values(["bucket", "pack_id"]))
    assert ((got["n_tokens"] <= 25) | (got["n_seqs"] == 1)).all()
    assert int(got["n_tokens"].sum()) == sum(len(s.split()) for s in texts)
    for b, grp in got.groupby("bucket"):
        stream = " ".join(grp["text"]).split()
        want = [w for i in range(len(texts)) if i % 8 == b
                for w in texts[i].split()]
        assert stream == want, b


def test_stream_mode_matches_duckdb(ray_session):
    """pack_sequences(mode='stream') over sf0.001 documents must equal the
    DuckDB string_agg + list-slice mirror frame-for-frame (pytest-level
    oracle — the driver report caps at 50 queries)."""
    import ray.data as rd

    got = (pack_sequences(
        rd.read_parquet(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"]),
        budget=64, mode="stream", n_buckets=8)
        .to_pandas().sort_values(["bucket", "pack_id"])
        .reset_index(drop=True))

    con = duckdb.connect()
    want = con.sql(f"""
        WITH b AS (
            SELECT doc_id % 8 AS bucket, doc_id, coalesce(text, '') AS text
            FROM read_parquet('{SF_DIR}/documents.parquet')
        ), s AS (
            SELECT bucket, string_agg(text, ' ' ORDER BY doc_id) AS alltext
            FROM b GROUP BY bucket
        ), w AS (
            SELECT bucket,
                   list_filter(regexp_split_to_array(alltext, '\\s+'),
                               x -> x <> '') AS ws
            FROM s
        ), c AS (
            SELECT bucket, ws, len(ws) AS n FROM w WHERE len(ws) > 0
        ), x AS (
            SELECT bucket, ws, n,
                   unnest(range(0, CAST(ceil(greatest(n - 64, 0) / 64.0)
                                        AS BIGINT) + 1)) AS pack_id
            FROM c
        )
        SELECT bucket, pack_id,
               array_to_string(ws[pack_id*64 + 1 : least(pack_id*64 + 64, n)],
                               ' ') AS text,
               least(64, n - pack_id*64) AS n_tokens
        FROM x ORDER BY bucket, pack_id
    """).df()

    assert len(got) == len(want) and len(got) > 50
    # all but each bucket's final pack are exactly full
    last = got.groupby("bucket")["pack_id"].transform("max")
    assert (got["n_tokens"][got["pack_id"] < last] == 64).all()
    for c in ("bucket", "pack_id", "n_tokens"):
        assert got[c].tolist() == want[c].astype(int).tolist(), c
    assert got["text"].tolist() == want["text"].tolist()


def test_pack_partition_invariant(ray_session):
    """Packs depend only on bucket membership + in-bucket key order,
    never on Ray's physical batching."""
    import ray.data as rd

    texts = [" ".join(f"d{i}w{j}" for j in range((i * 7) % 19))
             for i in range(120)]
    t = _doc_table(texts)
    frames = []
    for mode in ("next_fit", "stream"):
        for parts in (None, 13):
            ds = rd.from_arrow(t)
            if parts:
                ds = ds.repartition(parts)
            frames.append(
                pack_sequences(ds, budget=23, mode=mode, n_buckets=5)
                .to_pandas().sort_values(["bucket", "pack_id"])
                .reset_index(drop=True))
    assert frames[0].equals(frames[1])
    assert frames[2].equals(frames[3])


def test_pack_after_chunk_composition(ray_session):
    """chunk -> pack (the real pipeline order): chunk output's n_tokens
    column is trusted (no recount), windows stay doc-adjacent via
    order_cols, and the packed stream preserves every chunk token."""
    import ray.data as rd

    from nem_mms_ray.ops.chunking import chunk_documents

    rng = np.random.default_rng(3)
    texts = [" ".join(f"c{i}w{j}" for j in range(n))
             for i, n in enumerate(rng.integers(0, 120, 60))]
    chunks = chunk_documents(rd.from_arrow(_doc_table(texts)), max_tokens=7)
    got = (pack_sequences(chunks, budget=21, n_buckets=4,
                          order_cols=("chunk_id",), n_tokens_col="n_tokens")
           .to_pandas().sort_values(["bucket", "pack_id"]))
    # every chunk is <= 7 tokens, so no pack can be a single oversized seq
    assert (got["n_tokens"] <= 21).all()
    assert int(got["n_tokens"].sum()) == sum(len(s.split()) for s in texts)
    # a doc's windows are adjacent in the packed stream: within a bucket
    # the token stream equals the doc-then-chunk ordered chunk stream
    chk = chunks.to_pandas().sort_values(["doc_id", "chunk_id"])
    for b, grp in got.groupby("bucket"):
        want = [w for _, r in chk[chk["doc_id"] % 4 == b].iterrows()
                for w in r["text"].split()]
        assert " ".join(grp["text"]).split() == want, b
