"""Document chunking: split each doc's text into fixed-size token windows
— the context-window packing step of a pre-training pipeline (a 100k-word
crawl page must become ~200 x 512-token training rows).

Tokens are whitespace words (`str.split()` semantics, the same contract
as every token op here; the container has no BPE vocabulary, and the
window math is tokenizer-agnostic).  Chunk text is the window's words
joined with a single space — the exact mirror of DuckDB
`array_to_string(ws[a:b], ' ')`, which the pytest-level oracle runs side
by side (`tests/test_chunking.py`).

Ray shape: a pure fan-out `map_batches` — zero shuffles, one output row
per window, text streams through once.  The whole batch is processed with
FOUR Arrow/numpy calls (split kernel, window index math, one ListArray
wrap, one `binary_join`): no Python loop touches a row, and in the
default non-overlapping case the window ListArray is a ZERO-COPY view
over the split kernel's flat token buffer (windows tile each doc's token
run exactly, so list offsets are just window boundaries).

Scale note: a chunk row is ~8 x max_tokens bytes of text; downstream
batch sizes should budget for the fan-out (a blob-heavy doc expands
~1:1 in bytes but n_tokens/max_tokens x in rows).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_batch(t: pa.Table, max_tokens: int = 512, stride: int | None = None,
                id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """One batch of (id, text) -> (id, chunk_id, text, n_tokens) windows.

    Windows start every `stride` tokens (default `max_tokens`:
    non-overlapping; smaller = overlapping windows, the retrieval-chunk
    convention).  The last window of a doc may be shorter; a doc shorter
    than `max_tokens` yields exactly one window; null/empty docs yield
    NO rows.  `chunk_id` numbers windows within their doc from 0 in
    token order — deterministic and batch-boundary-invariant (windows
    depend only on the doc's own tokens).
    """
    if stride is None:
        stride = max_tokens
    if not 0 < stride <= max_tokens:
        raise ValueError(f"stride must be in (0, max_tokens]; got {stride}")
    from nem_mms_ray.ops.textkernels import split_whitespace_padded

    col = pc.fill_null(t.column(text_col), "")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat, di = split_whitespace_padded(col)
    counts = np.bincount(di, minlength=len(col))
    doc_start = np.zeros(len(col) + 1, np.int64)
    np.cumsum(counts, out=doc_start[1:])

    # windows per doc: ceil(max(n - max_tokens, 0) / stride) + 1, 0 if empty
    n_win = np.where(
        counts > 0,
        -(-(np.maximum(counts - max_tokens, 0)) // stride) + 1, 0)
    total = int(n_win.sum())
    ids = t.column(id_col)
    if total == 0:
        return pa.table({id_col: ids.slice(0, 0),
                         "chunk_id": pa.array([], pa.int64()),
                         text_col: pa.array([], pa.string()),
                         "n_tokens": pa.array([], pa.int64())})

    win_doc = np.repeat(np.arange(len(col), dtype=np.int64), n_win)
    first = np.zeros(len(col) + 1, np.int64)
    np.cumsum(n_win, out=first[1:])
    local = np.arange(total, dtype=np.int64) - first[win_doc]  # chunk_id
    start = local * stride
    length = np.minimum(max_tokens, counts[win_doc] - start)
    gstart = doc_start[win_doc] + start

    if stride == max_tokens:
        # non-overlapping windows tile each doc's token run exactly, so
        # the ListArray is a zero-copy offsets view over `flat`
        offsets = np.empty(total + 1, np.int64)
        offsets[:-1] = gstart
        offsets[-1] = gstart[-1] + length[-1]
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), flat.cast(pa.large_string()))
    else:
        # overlapping windows: one vectorized gather of the token indices
        idx = np.repeat(gstart, length)
        bump = np.arange(len(idx), dtype=np.int64)
        ends = np.zeros(total + 1, np.int64)
        np.cumsum(length, out=ends[1:])
        idx += bump - np.repeat(ends[:-1], length)
        lists = pa.LargeListArray.from_arrays(
            pa.array(ends, pa.int64()),
            pc.take(flat, pa.array(idx, pa.int64())).cast(pa.large_string()))

    text = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
    return pa.table({
        id_col: ids.take(pa.array(win_doc, pa.int64())),
        "chunk_id": pa.array(local, pa.int64()),
        text_col: text.cast(pa.string()),
        "n_tokens": pa.array(length.astype(np.int64), pa.int64()),
    })


def chunk_documents(ds, max_tokens: int = 512, stride: int | None = None,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Dataset[(id, chunk_id, text, n_tokens)] — every doc split into
    token windows (see `chunk_batch`).  Pure fan-out map, zero shuffles."""
    # validate NOW: a bad stride failing per-batch inside Ray tasks would
    # surface as a RayTaskError after the input is already read
    if not 0 < (stride if stride is not None else max_tokens) <= max_tokens:
        raise ValueError(
            f"stride must be in (0, max_tokens]; got stride={stride}, "
            f"max_tokens={max_tokens}")
    return ds.map_batches(
        functools.partial(chunk_batch, max_tokens=max_tokens, stride=stride,
                          id_col=id_col, text_col=text_col),
        batch_format="pyarrow")
