"""SemDeDup: within-cluster semantic dedup (ops/semdedup)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _naive(ids, x, cents, threshold):
    """The rule, scalar: assign by cosine argmax (first max wins), keep a
    row iff NO smaller-id row of its cluster has cosine >= threshold."""
    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    xn = norm(np.asarray(x, np.float64))
    cl = (xn @ norm(np.asarray(cents, np.float64)).T).argmax(axis=1)
    kept = []
    for i in range(len(ids)):
        dup = False
        for j in range(len(ids)):
            if (cl[j] == cl[i] and ids[j] < ids[i]
                    and float(xn[i] @ xn[j]) >= threshold):
                dup = True
                break
        if not dup:
            kept.append((int(ids[i]), int(cl[i])))
    return sorted(kept)


def _ray_result(ds, cents, threshold, **kw):
    from nem_mms_ray.ops.semdedup import semdedup

    df = semdedup(ds, cents, threshold=threshold, **kw).to_pandas()
    return sorted(zip(df["vec_id"].astype(int), df["cluster"].astype(int)))


def test_semdedup_drops_planted_scaled_dups(ray_session):
    """A scaled copy (x2) of a vector has cosine exactly 1.0 with its
    original and lands in the same cluster — it must be dropped; the
    original (smaller id) must survive."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 8))
    ids = np.arange(40, dtype=np.int64)
    dup_x = x[:10] * 2.0
    dup_ids = ids[:10] + 1000
    allx = np.vstack([x, dup_x])
    allids = np.concatenate([ids, dup_ids])
    cents = x[:4]
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": allids, "embedding": [list(map(float, v)) for v in allx]}))
    got = _ray_result(ds, cents, 0.95)
    got_ids = {i for i, _ in got}
    assert got_ids.issuperset(set(ids[:10].tolist()))
    assert not (got_ids & set(dup_ids.tolist()))
    assert got == _naive(allids, allx, cents, 0.95)


def test_semdedup_matches_naive_random(ray_session):
    """Random vectors, low threshold (many natural 'dups'), random
    centroids: the distributed result equals the scalar rule exactly."""
    import ray.data as rd

    rng = np.random.default_rng(17)
    x = rng.normal(size=(120, 6))
    ids = rng.permutation(5000)[:120].astype(np.int64)
    cents = rng.normal(size=(5, 6))
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": [list(map(float, v)) for v in x]}))
    assert _ray_result(ds, cents, 0.5) == _naive(ids, x, cents, 0.5)


def test_semdedup_partition_and_block_invariance(ray_session):
    """Result is independent of input partitioning and of the pairwise
    blocking factor (block smaller than the cluster exercises the
    cross-block triangle mask)."""
    import ray.data as rd

    rng = np.random.default_rng(29)
    x = rng.normal(size=(90, 5))
    ids = np.arange(90, dtype=np.int64)
    cents = x[:3]
    df = pd.DataFrame(
        {"vec_id": ids, "embedding": [list(map(float, v)) for v in x]})
    base = _ray_result(rd.from_pandas(df), cents, 0.6)
    repart = _ray_result(rd.from_pandas(df).repartition(7), cents, 0.6)
    small_block = _ray_result(rd.from_pandas(df), cents, 0.6, block=4)
    assert base == repart == small_block


def test_semdedup_matches_duckdb(ray_session):
    """DuckDB mirror over the sf0.001 embeddings table with planted x2
    duplicates — the oracle_sql() shape, pinned at pytest level."""
    import ray.data as rd

    con = duckdb.connect()
    base = con.execute(
        f"""SELECT vec_id, embedding
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            WHERE vec_id < 200""").fetch_df()
    planted = con.execute(
        f"""SELECT vec_id + 1000000 AS vec_id,
                   list_transform(embedding, x -> x * 2) AS embedding
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            WHERE vec_id < 10""").fetch_df()
    want = con.execute(f"""
        WITH base AS (
            SELECT vec_id, embedding
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            WHERE vec_id < 200
            UNION ALL
            SELECT vec_id + 1000000, list_transform(embedding, x -> x * 2)
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            WHERE vec_id < 10
        ),
        c AS (SELECT vec_id AS cid, embedding
              FROM read_parquet('{SF_DIR}/embeddings.parquet')
              WHERE vec_id < 4),
        s AS (SELECT b.vec_id, c.cid,
                     list_cosine_similarity(b.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[]) AS sim
              FROM base b, c),
        r AS (SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, cid) AS rn
              FROM s),
        asg AS (SELECT b.vec_id, r.cid AS cluster, b.embedding
                FROM base b JOIN r ON r.vec_id = b.vec_id AND r.rn = 1)
        SELECT a.vec_id, a.cluster FROM asg a
        WHERE NOT EXISTS (
            SELECT 1 FROM asg o
            WHERE o.cluster = a.cluster AND o.vec_id < a.vec_id
              AND list_cosine_similarity(a.embedding::DOUBLE[],
                                         o.embedding::DOUBLE[]) >= 0.95)
        ORDER BY vec_id""").fetch_df()
    con.close()

    alldf = pd.concat([base, planted], ignore_index=True)
    cents = np.stack(
        base.sort_values("vec_id")["embedding"].to_numpy()[:4])
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": alldf["vec_id"].astype(np.int64),
        "embedding": [list(map(float, v)) for v in alldf["embedding"]]}))
    got = _ray_result(ds, cents, 0.95)
    assert got == sorted(zip(want["vec_id"].astype(int),
                             want["cluster"].astype(int)))
