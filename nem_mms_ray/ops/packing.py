"""Sequence packing: combine short sequences into fixed-token-budget
training rows — the step after chunking (`ops/chunking.py`) in a
pre-training pipeline.  A corpus of 40-token chunks padded to a
2048-token context wastes 98% of every batch; packing restores it.

Two standard disciplines, both deterministic and order-pinned:

- ``mode="next_fit"`` (default): walk sequences in key order; a sequence
  that would overflow the budget CLOSES the current pack and starts the
  next.  Sequence boundaries are preserved (no text is ever split), so a
  single sequence longer than the budget gets a pack of its own — chunk
  first if that matters.  This is the greedy next-fit bin packing used
  when examples must stay whole (SFT, eval suites).
- ``mode="stream"``: concatenate the whole key-ordered token stream and
  cut at exact budget boundaries (sequences straddle packs) — the
  GPT-style pre-training discipline.  Every pack except a bucket's last
  has exactly ``budget`` tokens.

Tokens are whitespace words (`str.split()` semantics — the contract of
every token op here); pack text joins members with a single space, so
whitespace-token counts are exactly additive and the budget math is
consistent with `chunk_batch`.

Ray shape: ONE hash-bucket shuffle (`key % n_buckets` — bounded group
count, the sessionize/minhash convention) then a vectorized pass per
bucket.  Packing is inherently sequential in the scan order, so the
unit of order is the bucket: results are deterministic and
partition-invariant because they depend only on bucket membership and
the in-bucket sort, never on Ray's physical batching.  The next_fit
inner loop iterates over OUTPUT PACKS (searchsorted per pack over the
token cumsum), not input rows; text assembly is one Arrow
`binary_join` per bucket.

Scale note: a bucket must fit one worker's heap (it is a `map_groups`
group); size ``n_buckets`` ≈ corpus_bytes / 256 MB, and well above the
CPU count so no stage starves.  At 100 TB the bucket hash is the ONLY
data movement — the pack pass itself is embarrassingly parallel.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _next_fit_bounds(tok: np.ndarray, budget: int) -> np.ndarray:
    """Pack boundaries for greedy next-fit over positive token counts, in
    order: ``bounds[k]:bounds[k+1]`` is pack k's sequence span.  O(packs
    * log n) — the loop is per OUTPUT pack, via searchsorted over the
    cumulative token count."""
    cum = np.cumsum(tok, dtype=np.int64)
    n = len(tok)
    bounds = [0]
    s = 0
    base = 0
    while s < n:
        j = int(np.searchsorted(cum, base + budget, side="right"))
        if j <= s:  # single sequence exceeds budget: it packs alone
            j = s + 1
        bounds.append(j)
        base = int(cum[j - 1])
        s = j
    return np.asarray(bounds, np.int64)


def _join_spans(texts: pd.Series, bounds: np.ndarray, sep: str) -> list[str]:
    """Join ordered texts into one string per span — a single Arrow
    `binary_join` over a zero-copy ListArray view, no per-pack loop."""
    arr = pa.array(texts, pa.large_string())
    lists = pa.LargeListArray.from_arrays(pa.array(bounds, pa.int64()), arr)
    return pc.binary_join(
        lists, pa.scalar(sep, pa.large_string())).cast(pa.string()).to_pylist()


def pack_sequences(ds, budget: int = 2048, mode: str = "next_fit",
                   n_buckets: int = 64, id_col: str = "doc_id",
                   order_cols: Sequence[str] = (), text_col: str = "text",
                   n_tokens_col: str | None = None):
    """Dataset of packed training rows.

    Scan order within a bucket is ``(id_col, *order_cols)`` — pass
    ``order_cols=("chunk_id",)`` when packing `chunk_documents` output so
    a doc's windows stay adjacent; the full key must be unique for the
    output to be deterministic.  ``n_tokens_col`` names a precomputed
    whitespace-token count (chunk output carries one); when None it is
    computed per batch before the shuffle.  Zero-token sequences are
    dropped (the chunker emits none anyway).

    Output schema:

    - next_fit: ``(bucket int32, pack_id int64, text, n_tokens int64,
      n_seqs int64)`` — pack_id counts from 0 within its bucket;
      ``n_tokens <= budget`` unless ``n_seqs == 1``.
    - stream: ``(bucket int32, pack_id int64, text, n_tokens int64)`` —
      every pack but a bucket's last has exactly ``budget`` tokens.
    """
    if mode not in ("next_fit", "stream"):
        raise ValueError(f"mode must be 'next_fit' or 'stream'; got {mode!r}")
    if budget <= 0:
        raise ValueError(f"budget must be positive; got {budget}")
    from nem_mms_ray.ops.textkernels import split_whitespace_padded

    sort_cols = [id_col, *order_cols]
    keep = [*sort_cols, text_col, "__n_tokens"]

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        if n_tokens_col is not None:
            ntok = t.column(n_tokens_col)
            if isinstance(ntok, pa.ChunkedArray):
                ntok = ntok.combine_chunks()
            ntok = ntok.cast(pa.int64())
        else:
            col = pc.fill_null(t.column(text_col), "")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            _, di = split_whitespace_padded(col)
            ntok = pa.array(np.bincount(di, minlength=len(col)).astype(np.int64))
        t = t.append_column(
            "bucket", pa.array((ids % n_buckets).astype(np.int32)))
        t = t.append_column("__n_tokens", ntok)
        return t.select(["bucket", *keep])

    if mode == "next_fit":
        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            bucket = np.int32(g["bucket"].iloc[0])
            g = g.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
            tok = g["__n_tokens"].to_numpy(np.int64)
            g = g[tok > 0]
            tok = tok[tok > 0]
            if not len(g):
                return pd.DataFrame({
                    "bucket": pd.Series([], dtype=np.int32),
                    "pack_id": pd.Series([], dtype=np.int64),
                    "text": pd.Series([], dtype=object),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "n_seqs": pd.Series([], dtype=np.int64)})
            bounds = _next_fit_bounds(tok, budget)
            cum = np.zeros(len(tok) + 1, np.int64)
            np.cumsum(tok, out=cum[1:])
            return pd.DataFrame({
                "bucket": np.full(len(bounds) - 1, bucket, np.int32),
                "pack_id": np.arange(len(bounds) - 1, dtype=np.int64),
                "text": _join_spans(g[text_col].fillna(""), bounds, " "),
                "n_tokens": cum[bounds[1:]] - cum[bounds[:-1]],
                "n_seqs": np.diff(bounds),
            })
    else:
        from nem_mms_ray.ops.chunking import chunk_batch

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            bucket = np.int32(g["bucket"].iloc[0])
            g = g.sort_values(sort_cols, kind="mergesort")
            joined = _join_spans(
                g[text_col].fillna(""), np.array([0, len(g)], np.int64), " ")
            out = chunk_batch(
                pa.table({"doc_id": pa.array([0], pa.int64()),
                          "text": pa.array(joined, pa.string())}),
                max_tokens=budget).to_pandas()
            return pd.DataFrame({
                "bucket": np.full(len(out), bucket, np.int32),
                "pack_id": out["chunk_id"].to_numpy(np.int64),
                "text": out["text"],
                "n_tokens": out["n_tokens"].to_numpy(np.int64),
            })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas"))
