"""Shared Arrow-native text kernels for the token-stream operators.

One tokenizer, used by the inverted index, token top-k and the
heavy-hitter sketch, so "token" means the same thing everywhere: the
lowercased whitespace split of the text, computed entirely in Arrow C
kernels — the batch text column never materializes as Python strings.
(SQL mirror: `unnest(string_split(lower(text), ' '))` modulo empty
tokens, which whitespace-split never emits.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def split_whitespace_padded(col: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Whitespace-split a (combined, non-chunked) string array with
    Python str.split() semantics: (flat token StringArray, int64 doc
    index per token).  Null docs are fine — a null splits to a null
    list, which list_flatten/list_parent_indices skip, so they simply
    contribute no tokens.

    pyarrow 16.1's utf8_split_whitespace reads one byte PAST the data
    buffer when the final string abuts the buffer's exact end (which
    utf8_lower's freshly-sized allocation, and Ray's zero-copy object
    store buffers, both produce): the last doc's trailing token then
    nondeterministically keeps its whitespace ("cat " != "cat"),
    silently dropping it from every token match.  Appending a sentinel
    doc puts in-buffer bytes after every REAL string; the sentinel's
    own (possibly garbage) tokens are dropped by the doc_idx < n mask.
    Arrow's split also keeps boundary empties ("a " -> ["a", ""]), which
    Python's str.split() — the semantics every oracle mirrors — drops."""
    n = len(col)
    padded = pa.concat_arrays([col, pa.array([" "], col.type)])
    toks = pc.utf8_split_whitespace(padded)
    flat = pc.list_flatten(toks)
    doc_idx = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    keep = (pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            & (doc_idx < n))
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, doc_idx


def tokenize_column(col) -> tuple[pa.Array, np.ndarray]:
    """(flat token StringArray, doc_idx int64 array) for an Arrow string
    column: the lowercased whitespace tokens of every doc, flattened in
    C, with each token's originating doc position.  Null/empty docs
    contribute no tokens."""
    low = pc.utf8_lower(col)
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    return split_whitespace_padded(low)


def token_value_counts(col) -> tuple[pa.Array, np.ndarray]:
    """(vocabulary StringArray, int64 counts) for an Arrow string column:
    exact per-batch token frequencies via one C dictionary-encode plus an
    np.bincount over the integer codes."""
    flat, _ = tokenize_column(col)
    if len(flat) == 0:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    d = pc.dictionary_encode(flat)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(codes, minlength=len(d.dictionary)).astype(np.int64)
    vocab = d.dictionary
    if isinstance(vocab, pa.ChunkedArray):
        vocab = vocab.combine_chunks()
    return vocab, counts
