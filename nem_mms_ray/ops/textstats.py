"""Text-analysis operators over a documents table: token counting, quality
scoring, language ID, document fingerprinting.

All stages are vectorized `map_batches` transforms; the SQL-expressible ones
(token counts, punct ratios, md5 fingerprints, quality score) mirror their
DuckDB oracle formulas exactly (see __ray_entry__.oracle_sql) so the driver's
value-hash comparison passes.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa


_PUNCT = r"[.,!?;:]"
_PUNCT_RE = re.compile(_PUNCT)
_WS_RE = re.compile(r"\s+")

# language-ID: tiny per-language stopword lists (public common words)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "de": {"der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"},
    "fr": {"le", "la", "les", "des", "est", "dans", "pour", "que", "une", "sur"},
    "es": {"el", "la", "los", "de", "que", "en", "por", "con", "para", "una"},
    "it": {"il", "di", "che", "per", "con", "del", "una", "sono", "non", "più"},
    "nl": {"de", "het", "een", "van", "en", "dat", "voor", "met", "niet", "zijn"},
    "pt": {"de", "que", "em", "para", "com", "uma", "por", "mais", "dos", "não"},
}


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, n_chars_obs, punct_ratio — vectorized via pandas str.

    Token rule (shared with the SQL oracle): number of non-empty pieces when
    splitting on runs of whitespace.
    """
    text = batch.column("text").to_pandas().fillna("")
    stripped = text.str.strip()
    n_tokens = stripped.str.split(_WS_RE).map(
        lambda ps: 0 if len(ps) == 1 and ps[0] == "" else len(ps)
    )
    n_chars = text.str.len()
    n_punct = text.str.count(_PUNCT)
    punct_ratio = (n_punct / n_chars.clip(lower=1)).round(6)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens.astype("int64")),
            "n_chars_obs": pa.array(n_chars.astype("int64")),
            "punct_ratio": pa.array(punct_ratio.astype("float64")),
        }
    )


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """doc_id, quality — a deterministic, SQL-mirrorable quality formula:
    quality = min(1, n_tokens/100) * (1 - min(punct_ratio*5, 0.5))."""
    ts = token_stats_batch(batch)
    n_tokens = np.asarray(ts.column("n_tokens"), dtype=np.float64)
    punct = np.asarray(ts.column("punct_ratio"), dtype=np.float64)
    quality = np.minimum(1.0, n_tokens / 100.0) * (1.0 - np.minimum(punct * 5.0, 0.5))
    return pa.table(
        {
            "doc_id": ts.column("doc_id"),
            "quality": pa.array(np.round(quality, 6)),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """doc_id, fp = md5(text) hex — exact-dup key, SQL oracle: md5(text)."""
    text = batch.column("text").to_pylist()
    fps = [hashlib.md5((t or "").encode()).hexdigest() for t in text]
    return pa.table({"doc_id": batch.column("doc_id"), "fp": pa.array(fps)})


class LangId:
    """Actor-pool language classifier: stopword-hit scoring.

    Stateful stage pattern (ray_guide): word regex compiled and stopword
    tables built once per actor in __init__, applied per batch.
    """

    def __init__(self):
        self.word = re.compile(r"[\w']+", re.UNICODE)
        self.langs = sorted(_STOPWORDS)
        self.tables = [np.asarray(sorted(_STOPWORDS[lang]), dtype=str)
                       for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized scoring (r1 VERDICT item 6): tokens flatten once per
        batch, membership runs as np.isin over the UNIQUE tokens only, and
        per-doc hit counts come from one bincount per language — no
        per-doc/per-token Python loop.  Semantics identical to the scalar
        formula the DuckDB oracle mirrors: winner = first lang in sorted
        order with the (strictly) highest stopword-hit count; score =
        hits / n_tokens; empty or hitless docs -> ("und", 0.0)."""
        texts = batch.column("text").to_pylist()
        tok_lists = [self.word.findall((t or "")[:2000]) for t in texts]
        counts = np.array([len(ts) for ts in tok_lists], np.int64)
        n_docs = len(texts)
        flat = [w for ts in tok_lists for w in ts]
        if flat:
            arr = np.char.lower(np.asarray(flat, dtype=str))
            uniq, inv = np.unique(arr, return_inverse=True)
            doc_idx = np.repeat(np.arange(n_docs), counts)
            hits = np.zeros((n_docs, len(self.langs)), np.int64)
            for li, words in enumerate(self.tables):
                memb = np.isin(uniq, words)
                hits[:, li] = np.bincount(
                    doc_idx, weights=memb[inv].astype(np.float64),
                    minlength=n_docs).astype(np.int64)
            best_li = hits.argmax(axis=1)  # first max = sorted-lang tiebreak
            best = hits[np.arange(n_docs), best_li]
        else:
            best_li = np.zeros(n_docs, np.int64)
            best = np.zeros(n_docs, np.int64)
        langs = np.asarray(self.langs, dtype=object)
        preds = np.where(best > 0, langs[best_li], "und")
        safe = np.maximum(counts, 1)
        scores = np.round(np.where(best > 0, best / safe, 0.0), 6)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds.tolist(), type=pa.string()),
                "lang_score": pa.array(scores, type=pa.float64()),
            }
        )


def rolling_fingerprint_batch(batch: pa.Table, window: int = 64) -> pa.Table:
    """doc_id, rfp — Rabin-style rolling-hash document fingerprint: min of
    rolling polynomial hashes over byte windows (winnowing-lite). Not SQL-
    expressible; covered by rows-only check + unit tests."""
    out = []
    B = np.uint64(1000003)
    for t in batch.column("text").to_pylist():
        data = np.frombuffer((t or "").encode(), np.uint8).astype(np.uint64)
        if len(data) < window:
            h = int(data.sum() * 1000003 % (2**63))
        else:
            # vectorized rolling hash: prefix powers trick
            pows = np.power(B, np.arange(window, dtype=np.uint64), dtype=np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(data, window)
            hashes = (win * pows[None, :]).sum(axis=1, dtype=np.uint64)
            h = int(hashes.min() % np.uint64(2**63))
        out.append(h)
    return pa.table({"doc_id": batch.column("doc_id"), "rfp": pa.array(out, type=pa.int64())})


def repetition_batch(batch: pa.Table, ngram: int = 3) -> pa.Table:
    """doc_id, repetition = 1 - distinct_grams/total_grams over word
    n-grams WITH multiplicity — the intra-document template/boilerplate
    signal a pre-training filter thresholds on.  0.0 for gram-less docs.
    SQL-mirrorable: count(*) vs count(DISTINCT gram) per doc."""
    from nem_mms_ray.ops.dedup import _batch_word_ngrams

    texts = batch.column("text").to_pylist()
    ks = np.array([len((t or "").split()) for t in texts], np.int64)
    total = np.where(ks == 0, 0, np.where(ks < ngram, 1, ks - ngram + 1))
    distinct = np.array([len(s) for s in _batch_word_ngrams(texts, ngram)],
                        np.int64)
    rep = np.zeros(len(texts), np.float64)
    nz = total > 0
    rep[nz] = np.round(1.0 - distinct[nz] / total[nz], 6)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "repetition": pa.array(rep, pa.float64())})
