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


def tokenize_column(col) -> tuple[pa.Array, np.ndarray]:
    """(flat token StringArray, doc_idx int64 array) for an Arrow string
    column: the lowercased whitespace tokens of every doc, flattened in
    C, with each token's originating doc position.  Null/empty docs
    contribute no tokens."""
    low = pc.utf8_lower(col)
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    # pyarrow 16.1's utf8_split_whitespace reads one byte PAST the data
    # buffer when the final string abuts the buffer's exact end (which
    # utf8_lower's freshly-sized allocation, and Ray's zero-copy object
    # store buffers, both produce): the last doc's trailing token then
    # nondeterministically keeps its whitespace ("cat " != "cat"),
    # silently dropping it from every token match.  Appending a sentinel
    # doc puts in-buffer bytes after every REAL string; the sentinel's
    # own (possibly garbage) tokens are dropped by the doc_idx < n mask.
    n = len(low)
    padded = pa.concat_arrays([low, pa.array([" "], low.type)])
    toks = pc.utf8_split_whitespace(padded)
    flat = pc.list_flatten(toks)
    doc_idx = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    real = doc_idx < n
    if not real.all():
        flat = flat.filter(pa.array(real))
        doc_idx = doc_idx[real]
    # Arrow's split keeps boundary empties ("a " -> ["a", ""]); Python's
    # str.split() — the semantics every oracle mirrors — drops them
    nonempty = pc.not_equal(flat, "")
    if not pc.all(nonempty).as_py():
        keep = nonempty.to_numpy(zero_copy_only=False)
        flat = flat.filter(nonempty)
        doc_idx = doc_idx[keep]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, doc_idx


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
