"""Persisted inverted index: token -> sorted doc-id postings.

The text-retrieval analog of `ops.ann`'s persisted IVF index, with the
same index-once / query-many shape a 100 TB corpus needs:

- BUILD: one pass explodes each doc into its distinct lowercased
  whitespace tokens (the `token_topk` tokenizer), shards rows by token
  hash, and writes hive-partitioned Parquet
  (`index_dir/postings/shard=K/*.parquet`).  The corpus text never
  shuffles — only (token, doc_id) rows do.  (Build is a single
  write_parquet job; for checkpointed resume, drive it per input shard
  with the `state.manifest` pattern the encode pipeline uses.)
- LOOKUP: a query for T tokens reads ONLY the <= T shards those tokens
  hash to (partition pruning at the read), filters to the exact tokens,
  and returns sorted postings.  Per-query I/O is max(T, 1)/n_shards of
  the index regardless of corpus size.

Shard-count sizing: one shard's postings must fit the reader; stop-word
tokens concentrate in their shard, so corpora with heavy stop-words
should either raise n_shards or drop a stop-list before build (logged
hint, no silent cap).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

logger = logging.getLogger(__name__)


def _token_shard(tokens, n_shards: int) -> np.ndarray:
    h = pd.util.hash_array(np.asarray(tokens, dtype=object),
                           categorize=False).astype(np.uint64)
    return (h % n_shards).astype(np.int32)


def build_token_index(ds, index_dir, n_shards: int = 32,
                      id_col: str = "doc_id", text_col: str = "text") -> None:
    """Write the hive-partitioned postings index for `ds`."""
    index_dir = str(index_dir)

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), np.int64)
        toks, out_ids = [], []
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            uniq = sorted(set((t or "").lower().split()))
            toks.extend(uniq)
            out_ids.extend([ids[i]] * len(uniq))
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int32())})
        return pa.table({
            "token": pa.array(toks, pa.string()),
            id_col: pa.array(np.asarray(out_ids, np.int64)),
            "shard": pa.array(_token_shard(toks, n_shards)),
        })

    ds.map_batches(explode, batch_format="pyarrow").write_parquet(
        f"{index_dir}/postings", partition_cols=["shard"])


def lookup_postings(index_dir, tokens: list[str], n_shards: int = 32,
                    id_col: str = "doc_id"):
    """Dataset[(token, doc_id)] for the queried tokens, reading only the
    shards they hash to.  `n_shards` must match the build."""
    import ray.data as rd

    index_dir = str(index_dir)
    want = sorted(set(tokens))
    shards = sorted({int(s) for s in _token_shard(want, n_shards)})
    paths = [str(f) for s in shards
             for f in sorted(Path(f"{index_dir}/postings/shard={s}").glob("*.parquet"))]
    if not paths:
        return rd.from_arrow(pa.table({"token": pa.array([], pa.string()),
                                       id_col: pa.array([], pa.int64())}))
    wanted = set(want)

    def pick(t: pa.Table) -> pa.Table:
        toks = t.column("token").to_pylist()
        mask = pa.array([x in wanted for x in toks])
        sub = t.filter(mask)
        return pa.table({"token": sub.column("token"),
                         id_col: sub.column(id_col)})

    return rd.read_parquet(paths).map_batches(pick, batch_format="pyarrow")


def tfidf_topk(ds, query_tokens: list[str], k: int = 10,
               id_col: str = "doc_id", text_col: str = "text"):
    """Top-k docs for a token query by TF-IDF: score(d) = sum over query
    tokens t of tf(t, d) * ln(1 + N / df(t)), ties broken by doc id.

    Scale shape (two streaming passes, no shuffle of text):
      1. df pass: per batch, per query token, the number of docs
         containing it (+ batch doc counts); a tiny Sum groupby yields
         exact global df and N.  Weights ln(1 + N/df) round to 6 places
         BEFORE scoring so the oracle can reproduce them bit-for-bit.
      2. score pass: weights broadcast via ray.put; each batch scores its
         docs vectorized and emits only its local top-k — the driver
         merges <= n_batches * k candidate rows (the ann_topk pattern).

    Returns pa.Table[(doc_id, score)] sorted by (score desc, doc_id).
    """
    import ray
    from ray.data.aggregate import Sum

    want = sorted(set(query_tokens))

    def df_partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        rows = {w: 0 for w in want}
        for x in texts:
            toks = set((x or "").lower().split())
            for w in want:
                if w in toks:
                    rows[w] += 1
        return pa.table({"token": pa.array(want + ["__N__"], pa.string()),
                         "c": pa.array([rows[w] for w in want] + [len(texts)],
                                       pa.int64())})

    agg = (ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("c", alias_name="c")).to_pandas())
    cmap = dict(zip(agg["token"], agg["c"].astype(int)))
    n_docs = cmap.pop("__N__", 0)
    weights = {w: round(float(np.log1p(n_docs / cmap[w])), 6)
               for w in want if cmap.get(w)}
    wref = ray.put(weights)

    def score_batch(t: pa.Table) -> pa.Table:
        w = ray.get(wref)
        ids = np.asarray(t.column(id_col), np.int64)
        scores = np.zeros(len(ids), np.float64)
        for i, x in enumerate(t.column(text_col).to_pylist()):
            toks = (x or "").lower().split()
            if not toks:
                continue
            s = 0.0
            for tok in toks:
                wt = w.get(tok)
                if wt is not None:
                    s += wt
            scores[i] = s
        keep = scores > 0
        ids, scores = ids[keep], np.round(scores[keep], 4)
        if len(ids) > k:
            order = np.lexsort((ids, -scores))[:k]
            ids, scores = ids[order], scores[order]
        return pa.table({id_col: pa.array(ids), "score": pa.array(scores)})

    cand = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    top = cand.sort_values(["score", id_col],
                           ascending=[False, True]).head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)
