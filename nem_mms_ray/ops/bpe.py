"""Distributed BPE tokenizer training + application — the
tokenizer-fitting step of a training-data pipeline, expressed in the
shape the algorithm actually has at 100 TB:

  (1) ONE corpus-sized pass: distributed word-frequency count
      (`word_frequencies`, per-batch Arrow dictionary-encode partials ->
      a pre-combined groupby — the `token_topk` shape).  This is the only
      stage that touches every byte.
  (2) Driver-side merge loop over the WORD-TYPE table (`train_bpe`):
      classic pair-merge BPE (Sennrich et al. 2016, arXiv:1508.07909)
      runs on word types weighted by frequency, so its cost is bounded
      by the vocabulary (capped by `max_words`), not the corpus — the
      same "small trained state" pattern as the FSST symbol tables
      (`pipelines/encode.py`) and k-means centroids (`ops/ann.py`).
  (3) Corpus-sized apply (`apply_bpe`): a stateful map_batches actor
      builds the merge-rank table once per worker and encodes each
      DISTINCT word once per batch (dictionary-encode first — web text
      repeats words heavily), with a grow-only per-actor word cache
      across batches; per-doc token counts come from one np.bincount.

Token = lowercased whitespace word (`textkernels.tokenize_column`, the
repo-wide contract), segmented into word-internal subwords: no
end-of-word marker, GPT-2-style "merge every occurrence of the best
pair, lowest rank first" greedy application.  All ties are broken
lexicographically, so training is deterministic for a given word table
and N-cpu / 4N-cpu runs learn identical vocabularies.

The reference has no tokenizer analog; this is part of the §1.4
"training-data operators" surface (task brief), like chunking/packing.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

logger = logging.getLogger(__name__)


def word_frequencies(ds, text_col: str = "text", max_words: int | None = None):
    """Dataset[(word, n)] — exact corpus word frequencies (lowercased
    whitespace tokens).  With `max_words`, returns only the most frequent
    `max_words` word types (ties: token asc), the standard cap for BPE
    training; the cap is applied AFTER the exact global count, so it is
    deterministic and partition-invariant.

    Scale shape: per-batch dictionary-encode partials (one row per
    distinct word per batch, not per occurrence) -> groupby(word) Sum;
    the optional cap is a distributed sort+limit over the (already
    vocabulary-sized) aggregate.
    """
    from ray.data.aggregate import Sum

    from nem_mms_ray.ops.textkernels import token_value_counts

    def partial_counts(batch: pa.Table) -> pa.Table:
        vocab, counts = token_value_counts(batch.column(text_col))
        return pa.table({"word": vocab.cast(pa.string()),
                         "n_p": pa.array(counts)})

    agg = (ds.map_batches(partial_counts, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("n_p", alias_name="n")))
    if max_words is not None:
        agg = agg.sort(["n", "word"], descending=[True, False]).limit(max_words)
    return agg


def train_bpe(word_freqs, n_merges: int = 1000,
              min_freq: int = 2) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from a word-frequency table (a pandas
    DataFrame with columns (word, n), a pyarrow Table, or the Dataset
    `word_frequencies` returns — the table is vocabulary-sized by
    contract, so pulling it to the driver is bounded; cap it with
    `max_words` upstream).

    Classic pair-merge training over word TYPES weighted by frequency:
    each round merges the adjacent symbol pair with the highest total
    count (ties: lexicographically smallest pair), stopping early when
    the best pair's count falls below `min_freq`.  Pair counts are
    maintained incrementally (only words containing the merged pair are
    re-scanned), so a round costs O(words touched), not O(vocabulary).

    Returns the ordered merge list [(left, right), ...] — the trained
    state `apply_bpe` consumes.
    """
    if hasattr(word_freqs, "to_pandas"):       # Dataset / pa.Table
        word_freqs = word_freqs.to_pandas()
    if not isinstance(word_freqs, pd.DataFrame):
        word_freqs = pd.DataFrame(list(word_freqs), columns=["word", "n"])
    words = [list(w) for w in word_freqs["word"].astype(str)]
    freqs = word_freqs["n"].to_numpy(np.int64)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def count_word(wi: int, sign: int) -> None:
        syms, f = words[wi], int(freqs[wi]) * sign
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(words)):
        count_word(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best, best_n = None, min_freq - 1
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            count_word(wi, -1)       # retract this word's old pairs
            syms, out, i = words[wi], [], 0
            while i < len(syms):     # merge every non-overlapping occurrence
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            count_word(wi, +1)       # re-add with the merged symbol
        # drop zeroed entries so the argmax scan stays vocabulary-bounded
        dead = [p for p, n in pair_counts.items() if n <= 0]
        for p in dead:
            pair_counts.pop(p, None)
            pair_words.pop(p, None)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE segmentation of one word: repeatedly merge every
    occurrence of the lowest-rank adjacent pair (GPT-2 application
    order) until no learned pair remains."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        merged, out, i = best[0] + best[1], [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BpeEncoder:
    """Stateful map_batches callable: per-doc BPE token counts (and
    optionally the subword strings) under a trained merge list.

    State (`ranks` dict + the grow-only distinct-word segmentation
    cache) is built ONCE per actor in __init__ / grown across batches —
    the actor-pool pattern (§2.4 ST-target).  Per batch: one Arrow
    tokenize + dictionary-encode, the Python merge loop runs per
    DISTINCT word (cache-missing ones only), and per-doc counts are a
    single np.bincount over the token->doc map.
    """

    def __init__(self, merges: list[tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id",
                 emit_tokens: bool = False):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col, self.id_col = text_col, id_col
        self.emit_tokens = emit_tokens
        self.cache: dict[str, list[str]] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from nem_mms_ray.ops.textkernels import tokenize_column

        n = t.num_rows
        flat, doc_idx = tokenize_column(t.column(self.text_col))
        enc = pc.dictionary_encode(flat)
        vocab = enc.dictionary.to_pylist() if len(flat) else []
        codes = (enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                 if len(flat) else np.zeros(0, np.int64))
        per_word = np.empty(len(vocab), np.int64)
        segs: list[list[str]] = []
        for j, w in enumerate(vocab):
            s = self.cache.get(w)
            if s is None:
                s = _encode_word(w, self.ranks)
                self.cache[w] = s
            per_word[j] = len(s)
            if self.emit_tokens:
                segs.append(s)
        n_tok = np.bincount(doc_idx, weights=per_word[codes],
                            minlength=n).astype(np.int64) if len(flat) \
            else np.zeros(n, np.int64)
        cols = {self.id_col: t.column(self.id_col),
                "n_bpe_tokens": pa.array(n_tok)}
        if self.emit_tokens:
            order = np.argsort(doc_idx, kind="stable")
            toks = [s for c in codes[order] for s in segs[c]]
            offs = np.zeros(n + 1, np.int64)
            np.add.at(offs, doc_idx + 1, per_word[codes])
            cols["bpe_tokens"] = pa.ListArray.from_arrays(
                pa.array(np.cumsum(offs), pa.int32()),
                pa.array(toks, pa.string()))
        return pa.table(cols)


def apply_bpe(ds, merges: list[tuple[str, str]], text_col: str = "text",
              id_col: str = "doc_id", emit_tokens: bool = False,
              concurrency: int | tuple = (1, 8)):
    """Dataset[(id_col, n_bpe_tokens[, bpe_tokens])] — per-doc subword
    counts under a trained merge list.  Pure fan-out map, zero shuffles;
    the merge table ships once per actor (it is merges-sized, not
    corpus-sized) and the word cache amortizes across that actor's
    batches.

    `concurrency` defaults to an ELASTIC (min, max) pool: a fixed pool
    sized at the session's CPU count deadlocks a small cluster (all
    slots reserved by idle actors, the upstream read task starves —
    measured on a 4-CPU session with concurrency=4)."""
    return ds.map_batches(
        BpeEncoder, fn_constructor_kwargs={
            "merges": merges, "text_col": text_col, "id_col": id_col,
            "emit_tokens": emit_tokens},
        batch_format="pyarrow", concurrency=concurrency)
