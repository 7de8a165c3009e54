"""Winnowing fingerprints: substring-level duplicate detection.

The substring-dedup family (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better") targets byte SPANS copied between documents
— the regime whole-doc shingle MinHash misses (a 300-char license block
inside two otherwise-different pages barely moves doc-level Jaccard, but
is exactly the memorization hazard that paper measures).  The exact tool
is a corpus suffix array, which is inherently sequential; the published
distributable alternative is local fingerprinting: Schleimer / Wilkerson /
Aiken, SIGMOD 2003 ("Winnowing: Local Algorithms for Document
Fingerprinting").

Per document: rolling polynomial hashes over all codepoint k-grams, then
the MINIMUM hash inside every window of `window` consecutive k-gram hashes
is selected (ties collapse — only the selected hash VALUES matter for pair
detection, so min-per-window equals the paper's rightmost-min rule).  Two
properties carry the semantics:

* GUARANTEE (the paper's correctness property): two docs sharing a
  substring of length >= window + k - 1 codepoints share at least one
  selected fingerprint — no false negatives above the threshold length.
* SOUNDNESS: every selected fingerprint is a real k-gram hash of the doc,
  so a reported pair shares a k-codepoint substring (up to 64-bit hash
  equality, the same no-collision contract as the gram-hash dedup family).
* DENSITY: ~2/(window+1) of all k-grams are selected, so the exploded
  index is ~window/2 x smaller than the full k-gram explode — the lever
  that makes substring-level indexing feasible at 100 TB.

Distributed shape = the exact n-gram family's (`ops/dedup.py`,
`ngram_jaccard_pairs`): ONE map pass explodes (doc_id, fp, bucket, sz)
with the doc's selected-fingerprint count stamped on every row -> coarse
fp-hash bucket groupby -> per-bucket vectorized pair expansion with the
same frequent-fingerprint skew guard (`_gram_pairs_in_bucket`, reused) ->
`bucketed_pair_agg` sums shared-fp counts per pair.  Cost scales with
fingerprint SHARING, not n^2; a boilerplate fingerprint shared by M docs
is bounded by the same opt-in `max_fp_df` cap, logged never silent.

`window=1` selects EVERY k-gram: pairs sharing ANY k-codepoint substring,
exactly — the guaranteed-recall regime the DuckDB oracle mirrors with a
substring-explode SQL (`tests/test_winnow.py`).  `window>1` is the scale
regime, pinned by the guarantee/soundness tests.
"""

from __future__ import annotations

import functools
import logging

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)

# odd multiplier -> bijective modulo 2^64 per step; same constant family as
# the dedup gram hashes (_GRAM_MULT[0], ops/dedup.py)
_B = np.uint64(0x9E3779B97F4A7C15)


def _codepoints(text) -> np.ndarray:
    """Codepoint array (uint64) of a python string; () for None/''.

    utf-32-le round-trip is the vectorized way to get CHARACTER (not byte)
    semantics, matching SQL substr() in the oracle mirror."""
    if not text:
        return np.zeros(0, np.uint64)
    return np.frombuffer(text.encode("utf-32-le"), np.uint32).astype(np.uint64)


_M64 = (1 << 64) - 1
_BINV = np.uint64(pow(int(_B), -1, 1 << 64))  # B odd -> invertible mod 2^64


def _kgram_hashes(cps: np.ndarray, k: int) -> np.ndarray:
    """Positional polynomial hash of every k-gram: h = sum cp[j]*B^(k-1-j)
    (mod 2^64, numpy wrap).  Equal k-grams hash equal regardless of
    position; the positional weights keep anagrams apart.  Per-doc
    reference form — the batch hot path is `_flat_hashes`, bit-identical
    (pinned by test_flat_fast_path_parity)."""
    nh = len(cps) - k + 1
    if nh <= 0:
        return np.zeros(0, np.uint64)
    pows = np.empty(k, np.uint64)
    pw = 1
    for j in range(k - 1, -1, -1):  # python ints: no numpy scalar-overflow warn
        pows[j] = pw
        pw = (pw * int(_B)) & _M64
    win = np.lib.stride_tricks.sliding_window_view(cps, k)
    return (win * pows[None, :]).sum(axis=1, dtype=np.uint64)


def _flat_corpus(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat codepoints uint32, per-doc codepoint lengths) for a whole
    batch — ONE join + utf-32 encode instead of per-doc encodes.  uint32
    is the C kernel's input form; the numpy arithmetic below upcasts to
    uint64 where it multiplies."""
    joined = "".join(t if t else "" for t in texts)
    flat = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
    lens = np.fromiter((len(t) if t else 0 for t in texts), np.int64,
                       count=len(texts))
    return flat, lens


def _flat_hashes(flat: np.ndarray, k: int) -> np.ndarray:
    """k-gram hashes at EVERY flat position (including ones spanning doc
    boundaries — callers mask with `_valid_positions`).  Prefix-product
    rolling form: h_s = B^(s+k-1) * (Q[s+k-1] - Q[s-1]) with
    Q = cumsum(flat * B^-i) — bit-identical to `_kgram_hashes` (B is odd,
    so exactly invertible mod 2^64), O(N) memory independent of k, and
    ~3x faster than the windowed product at k=8.

    When the C kernel is present (`winnow_kernel.c:rolling_hashes`) the
    sweep runs there instead — one fused Rabin-Karp pass, bit-identical
    (test_flat_hashes_native_parity), measured 10x (506 vs 50 Mcp/s on
    8M codepoints) because the numpy form walks five N-sized uint64
    temporaries while the C form streams once with no allocation.  Gated
    on uint32 input (the `_flat_corpus` form) so no hidden copy."""
    n = len(flat)
    if n < k:
        return np.zeros(0, np.uint64)
    if flat.dtype == np.uint32:
        from nem_mms_ray.ops import _winnow_native

        h = _winnow_native.rolling_hashes(flat, k, int(_B))
        if h is not None:
            return h
    fwd = np.ones(n, np.uint64)
    np.cumprod(np.full(n - 1, _B, np.uint64), out=fwd[1:])
    inv = np.ones(n, np.uint64)
    np.cumprod(np.full(n - 1, _BINV, np.uint64), out=inv[1:])
    q = np.cumsum(flat * inv, dtype=np.uint64)
    h = fwd[k - 1:] * q[k - 1:]
    h[1:] -= fwd[k:] * q[:n - k]
    return h


def _valid_positions(lens: np.ndarray, k: int
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(pos, doc_idx, nh): the flat positions whose k-gram lies entirely
    inside one doc, the doc index of each, and per-doc position counts."""
    nh = np.maximum(lens - k + 1, 0)
    offs = np.cumsum(lens) - lens
    total = int(nh.sum())
    cum = np.cumsum(nh) - nh
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum, nh)
    pos = np.repeat(offs, nh) + intra
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), nh)
    return pos, doc_idx, nh


def winnow_select(cps: np.ndarray, k: int, window: int) -> np.ndarray:
    """Distinct selected fingerprint values (uint64) for one doc.

    Docs with fewer than `window` k-grams use a truncated window (their
    global min survives), so every doc with >= k codepoints is indexed;
    shorter docs have no k-gram and emit nothing (outside the guarantee
    length anyway)."""
    h = _kgram_hashes(cps, k)
    if len(h) == 0:
        return h
    w = min(window, len(h))
    if w > 1:
        h = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
    return np.unique(h)


def _perdoc_unique(sel: np.ndarray, sdoc: np.ndarray, ndocs: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, distinct fps) from run-deduped doc-major (sel, sdoc):
    per-doc np.unique over the pre-sliced contiguous segments — measured
    ~7x cheaper than a global lexsort of the same rows."""
    if not len(sel):
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    cnts = np.bincount(sdoc, minlength=ndocs)
    cuts = np.concatenate([[0], np.cumsum(cnts)])
    outs = [np.unique(sel[cuts[i]:cuts[i + 1]]) for i in range(ndocs)]
    ucnt = np.fromiter((len(o) for o in outs), np.int64, count=ndocs)
    return (np.repeat(np.arange(ndocs, dtype=np.int64), ucnt),
            np.concatenate(outs))


def _batch_winnow_sets(texts, k: int, window: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, fp) of every doc's distinct selected fingerprints — the
    whole-batch fast path, set-identical per doc to `winnow_select`
    (test_flat_fast_path_parity; row order is NOT doc-major — the
    consumers bucket/bincount, so order is free).  Shape: one flat encode,
    one rolling-hash pass, a log-doubling windowed min (O(log w) full
    passes, no w-wide temp), a diff-trick mask for cross-doc windows, an
    adjacent-run pre-dedup (consecutive windows usually share their min —
    that is the point of winnowing), then per-doc np.unique over the
    pre-sliced segments (measured ~7x cheaper than a global lexsort).
    2.1x over the per-doc loop on 1.2 KB docs, 3.5x on 300 B docs
    (BASELINE.md r5).  The C kernel (`winnow_kernel.c`) replaces the
    hash+min+dedup middle with one fused pass when a compiler is present
    (bit-identical values — Rabin-Karp update of the same polynomial;
    test_native_kernel_parity) and the residual wall becomes the encode +
    per-doc unique tail."""
    ndocs = len(texts)
    flat, lens = _flat_corpus(texts)
    from nem_mms_ray.ops import _winnow_native

    native = _winnow_native.winnow_batch(flat, lens, k, window, int(_B))
    if native is not None:
        sel, cnts = native
        sdoc = np.repeat(np.arange(ndocs, dtype=np.int64), cnts)
        return _perdoc_unique(sel, sdoc, ndocs)
    h = _flat_hashes(flat, k)
    pos, _, nh = _valid_positions(lens, k)
    hv = h[pos]  # per-doc k-gram hash runs, concatenated
    cum = np.cumsum(nh) - nh
    w = min(window, int(nh.max())) if len(nh) else window
    empty = (np.zeros(0, np.int64), np.zeros(0, np.uint64))
    if w > 1:
        nwin = len(hv) - w + 1
        if nwin <= 0:
            sel = sdoc = None  # every doc is truncated (nh < w)
        else:
            # windowed min by doubling: mm[i] = min(hv[i : i+p])
            mm = hv.copy()
            p = 1
            while p * 2 <= w:
                np.minimum(mm[:-p], mm[p:], out=mm[:len(mm) - p])
                p *= 2
            m = (np.minimum(mm[:nwin], mm[w - p:w - p + nwin])
                 if p < w else mm[:nwin])
            # drop windows crossing a doc boundary: mark each doc's
            # trailing invalid run once (diff trick), not per position
            wn = np.maximum(nh - w + 1, 0)
            bad = np.zeros(nwin + 1, np.int32)
            np.add.at(bad, np.minimum(cum + wn, nwin), 1)
            np.add.at(bad, np.minimum(cum + nh, nwin), -1)
            sel = m[np.cumsum(bad[:-1]) == 0]
            sdoc = np.repeat(np.arange(ndocs, dtype=np.int64), wn)
    else:
        sel = hv
        sdoc = np.repeat(np.arange(ndocs, dtype=np.int64), nh)
    if sel is not None and len(sel):
        # adjacent-run pre-dedup: one cheap pass drops ~(w-1)/(w+1) of
        # rows before the per-doc unique below
        run = np.empty(len(sel), np.bool_)
        run[0] = True
        run[1:] = (sel[1:] != sel[:-1]) | (sdoc[1:] != sdoc[:-1])
        sdoc, sel = _perdoc_unique(sel[run], sdoc[run], ndocs)
    elif sel is None:
        sdoc, sel = empty
    # truncated docs (0 < nh < w) keep their global min — rare: only docs
    # shorter than k+w-1 codepoints; tiny loop, one fp each
    if w > 1:
        short = np.nonzero((nh > 0) & (nh < w))[0]
        if len(short):
            mins = np.array([hv[cum[d]:cum[d] + nh[d]].min()
                             for d in short], np.uint64)
            sel = np.concatenate([sel, mins])
            sdoc = np.concatenate([sdoc, short])
    return sdoc, sel


def _winnow_explode(batch: pa.Table, k: int, window: int, id_col: str,
                    text_col: str, n_buckets: int) -> pa.Table:
    """(id, gram, bucket, sz) rows — one per selected fingerprint, with the
    doc's selected count stamped on each row (the sz-carry trick from
    ngram_jaccard_pairs: no second pass, no driver size dict).  Column
    names match `_gram_pairs_in_bucket`'s contract so the pair stage is
    shared verbatim with the n-gram family."""
    ids = np.asarray(batch.column(id_col), dtype=np.int64)
    sdoc, fps = _batch_winnow_sets(batch.column(text_col).to_pylist(),
                                   k, window)
    counts = np.bincount(sdoc, minlength=len(ids)).astype(np.int64)
    return pa.table({
        id_col: pa.array(ids[sdoc]),
        "gram": pa.array(fps.view(np.int64)),
        "bucket": pa.array((fps % np.uint64(n_buckets)).astype(np.int32)),
        "sz": pa.array(counts[sdoc]),
    })


def winnow_fingerprints(ds, k: int = 8, window: int = 4,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Dataset[(doc_id, fp)] — each doc's distinct selected fingerprints.

    Pure fan-out map, zero shuffles: the index-build half of the op,
    reusable as a join key against a known-bad span list (the Lee et al.
    memorization-probe use)."""

    def explode(t: pa.Table) -> pa.Table:
        e = _winnow_explode(t, k, window, id_col, text_col, 1)
        return e.select([id_col, "gram"]).rename_columns([id_col, "fp"])

    return ds.map_batches(explode, batch_format="pyarrow")


def winnow_dup_pairs(ds, k: int = 8, window: int = 4, min_shared: int = 1,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = 256, max_fp_df: int | None = None):
    """Dataset[(a, b, shared, containment)], a < b: doc pairs sharing
    >= `min_shared` selected fingerprints.

    `shared` counts distinct shared fingerprints; `containment` =
    shared / min(|fps_a|, |fps_b|) — the span-copy signal (a small doc
    fully embedded in a big one scores 1.0 where Jaccard would vanish).

    window=1: exact "shares any k-codepoint substring" semantics (DuckDB
    oracle regime).  window>1: candidates for spans >= window+k-1, sound
    per selected fp.  `max_fp_df` is the same OPT-IN frequent-key skew
    guard as `ngram_jaccard_pairs.max_gram_df` (None = exact contract:
    boilerplate shared by M docs emits its M^2/2 pairs — cap it only
    after exact/near dedup has run, drops are logged never silent)."""
    from nem_mms_ray.ops.dedup import _gram_pairs_in_bucket, bucketed_pair_agg

    explode = functools.partial(_winnow_explode, k=k, window=window,
                                id_col=id_col, text_col=text_col,
                                n_buckets=n_buckets)
    inter = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(functools.partial(_gram_pairs_in_bucket, id_col=id_col,
                                      max_gram_df=max_fp_df),
                    batch_format="pandas")
    )
    pairs = bucketed_pair_agg(
        inter,
        lambda g: g.groupby(["a", "b"], as_index=False)
                   .agg({"cnt": "sum", "na": "max", "nb": "max"}))

    def score(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("a"), np.int64)
        b = np.asarray(t.column("b"), np.int64)
        c = np.asarray(t.column("cnt"), np.int64)
        na = np.asarray(t.column("na"), np.int64)
        nb = np.asarray(t.column("nb"), np.int64)
        keep = c >= min_shared
        cont = np.round(c[keep] / np.minimum(na[keep], nb[keep]), 6)
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                         "shared": pa.array(c[keep]),
                         "containment": pa.array(cont)})

    return pairs.map_batches(score, batch_format="pyarrow")


def winnow_dedup(ds, min_containment: float = 0.5, min_shared: int = 2,
                 k: int = 8, window: int = 4, id_col: str = "doc_id",
                 text_col: str = "text", n_buckets: int = 256,
                 max_fp_df: int | None = None):
    """The substring-dedup ENDGAME (the minhash family's shape,
    `ops/curate.curate_documents_near`): winnow pairs above the
    containment threshold -> connected components -> keep only each
    cluster's minimum-id representative.  Returns the surviving Dataset
    with all input columns.

    Containment (shared / min fingerprint count) is the span-copy signal:
    at the 0.5 default a doc half-embedded in another clusters with it,
    while ordinary phrase sharing does not.  The input is materialized
    once — it is consumed by the fingerprint pass and the final anti-join
    (a production run would checkpoint it to parquet instead)."""
    import pyarrow.compute as pc

    from nem_mms_ray.ops.curate import drop_ids
    from nem_mms_ray.ops.dedup import connected_components

    ds = ds.materialize()
    pairs = winnow_dup_pairs(ds, k=k, window=window, min_shared=min_shared,
                             id_col=id_col, text_col=text_col,
                             n_buckets=n_buckets, max_fp_df=max_fp_df)
    flagged = pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("containment"),
                                            min_containment)),
        batch_format="pyarrow")
    comps = connected_components(flagged)
    losers = comps.map_batches(
        lambda t: pa.table({"id": t.column("id").filter(
            pc.not_equal(t.column("id"), t.column("component")))}),
        batch_format="pyarrow")
    return drop_ids(ds, losers, id_col=id_col)
