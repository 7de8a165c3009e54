"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (ray_guide patterns):
- exact: vectorized md5 per batch -> groupby(fp) keep min doc_id (one small
  shuffle over 16-byte keys, pre-hashed so text never shuffles)
- minhash: shingle+minhash per batch (numpy) -> explode to
  (band, band_hash, doc_id) -> groupby bands -> candidate pairs -> Jaccard
  verify -> representative = min doc_id of the pair graph (label propagation)
- simhash/embedding: per-batch signatures; bucket by prefix/hyperplane for
  candidate generation.

All randomness is seeded; outputs are deterministic for a given input.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

_P61 = np.uint64((1 << 61) - 1)  # Mersenne prime for minhash permutations
_POPCNT = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (byte-LUT; numpy<2 lacks
    bitwise_count)."""
    if len(x) == 0:
        return np.zeros(0, np.int64)
    return _POPCNT[np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)].sum(
        axis=1).astype(np.int64)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _chain_to_min(u: np.ndarray, what: str) -> tuple[np.ndarray, np.ndarray]:
    """Degenerate-bucket fallback: pair every id against the bucket's min id
    (O(n) pairs) instead of silently truncating — duplicates still link to a
    representative, and the metric-verify stage rejects false candidates.
    Logged, per the no-silent-caps rule."""
    logger.warning("dedup: oversized %s bucket (%d ids) — chaining to min id",
                   what, len(u))
    return np.full(len(u) - 1, u[0], np.int64), u[1:].astype(np.int64)


# ---------------------------------------------------------------------------
# distributed pair verify (shuffle-join payloads onto candidate pairs)
# ---------------------------------------------------------------------------


def _payload_store(payload_series) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 values, int64 byte offsets) for a sequence of bytes
    payloads — the zero-copy broadcast form (numpy arrays ship through
    the object store without pickling 100k+ bytes objects) and the input
    layout of the C set-intersection kernel.  Slot k is
    flat[off[k]:off[k+1]]; one extra EMPTY slot is appended at the end
    as the router target for ids with no payload."""
    blobs = [v if isinstance(v, (bytes, bytearray, memoryview)) else b""
             for v in payload_series]
    off = np.zeros(len(blobs) + 2, np.int64)
    off[1:len(blobs) + 1] = np.cumsum([len(v) for v in blobs])
    off[len(blobs) + 1] = off[len(blobs)]  # sentinel empty slot
    flat = np.frombuffer(b"".join(blobs), np.uint8) if blobs else \
        np.zeros(0, np.uint8)
    return flat, off


def _filter_by_sorted_ids(t: pa.Table, s: np.ndarray, col: str) -> pa.Table:
    """Rows of `t` whose int64 `col` value appears in the SORTED distinct
    array `s` — the clip-then-compare searchsorted membership idiom, owned
    once (empty `s` -> empty table).  `s` MUST be sorted (np.unique /
    np.sort output)."""
    ids = np.asarray(t.column(col), np.int64)
    if not len(s):
        return t.slice(0, 0)
    pos = np.clip(np.searchsorted(s, ids), 0, len(s) - 1)
    return t.filter(pa.array(s[pos] == ids))


def _store_positions(sorted_ids: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Store slot of each id in `x` against a `_payload_store` whose rows
    are keyed by `sorted_ids` (ascending, distinct); ids absent from the
    store map to the sentinel EMPTY slot at index len(sorted_ids)."""
    empty_slot = len(sorted_ids)
    if not empty_slot:
        return np.zeros(len(x), np.int64)  # slot 0 IS the sentinel
    p = np.clip(np.searchsorted(sorted_ids, x), 0, empty_slot - 1)
    return np.where(sorted_ids[p] == x, p, empty_slot).astype(np.int64)


def _jaccard_store_batch(flat: np.ndarray, off: np.ndarray,
                         a_pos: np.ndarray, b_pos: np.ndarray,
                         min_metric: float = 0.0) -> np.ndarray:
    """Vectorized Jaccard over a `_payload_store` of serialized uint64
    shingle sets (`_shingle_blobs` layout): one C merge-intersection call
    for the whole batch (`ops/setops_kernel.c`), ~0.4us/pair with the
    min_metric early exit vs ~12us/pair for per-pair np.intersect1d.
    min_metric > 0: pairs provably below it report an upper bound that
    still thresholds identically (see intersect_counts); survivors are
    exact.  Matches `_jaccard_blobs` bit-for-bit above the threshold."""
    from nem_mms_ray.ops._setops_native import intersect_counts

    vals = flat.view(np.uint64)
    eoff = off // 8  # byte offsets -> uint64 element offsets
    inter = intersect_counts(vals, eoff, a_pos, b_pos, min_j=min_metric)
    na = eoff[a_pos + 1] - eoff[a_pos]
    nb = eoff[b_pos + 1] - eoff[b_pos]
    union = na + nb - inter
    return np.where(na + nb == 0, 1.0,
                    np.where(union > 0, inter / np.maximum(union, 1), 0.0))


def pairs_payload_metric(pairs, payloads, pair_metric, metric_name: str,
                         n_buckets: int = 64, carry: tuple = (),
                         max_broadcast_payload: int = 256 << 20,
                         max_probe_pairs: int = 4_000_000,
                         pair_metric_batch=None, metric_min: float = 0.0):
    """Score candidate pairs against per-id binary payloads, fully
    distributed — the scale path when candidates / payloads no longer fit a
    driver-side broadcast (VERDICT r1 items 2-3).

    pairs: Dataset[(a: int64, b: int64)], a < b, distinct.  Materialized
      here once (it is consumed by two branches in every regime; a lazy
      lineage — e.g. the bucketed_pair_agg shuffle minhash_dedup feeds in —
      would otherwise re-execute per consumption, ADVICE r4).
    payloads: Dataset[(jid: int64, payload: binary-like)] — one row per id;
      in the two-shuffle regime, ids never referenced by a pair are dropped
      by the attach stage's inner merge (a distributed semi-join — nothing
      pair-sized ever lands on the driver above `max_probe_pairs`).
      Alternatively a FACTORY callable (id_ref_or_None -> that Dataset):
      the broadcast regime passes the referenced-id ObjectRef so payload
      construction itself can skip unreferenced rows (see minhash_dedup).
    pair_metric(bytes, bytes) -> float, computed once per pair; with
    `carry` set, extra numeric columns of `pairs` ride along and arrive as
    keyword args: pair_metric(bytes, bytes, **{c: float(v)}).

    pair_metric_batch (optional, ignored when `carry` is set): vectorized
    twin with signature (flat_u8, byte_offsets, a_pos, b_pos, metric_min)
    -> float64 scores over a `_payload_store` — scores a whole batch in
    one call (C kernel for Jaccard: `_jaccard_store_batch`) and lets the
    broadcast regime ship payloads as a zero-copy numpy triple instead
    of a pickled dict.  metric_min > 0 permits the metric to report any
    value strictly below metric_min for pairs provably under it (the
    early-exit contract); callers thresholding at metric_min see
    identical survivors with exact scores.

    Shape — two coarse-bucketed all-to-alls, PAYLOAD-DEDUPLICATED (r4):
      (1) group by hash(jid): each payload meets the DISTINCT set of score
          buckets (hash(a,b) %% n_buckets) whose pairs reference it and is
          emitted ONCE PER (id, score bucket) — never once per pair.  A
          mega-duplicate id referenced by M pairs therefore ships at most
          min(M, n_buckets) payload copies instead of M (the r4 flagship
          profile measured 2.37M pairs x ~1.6 KB blob = GBs of duplicated
          payload under the old per-pair-row attach).
      (2) group by hash(a, b): pair rows (bare ints + carry) meet the
          deduplicated payloads; a per-bucket dict serves both sides of
          every pair.  Coarse buckets keep Ray group count flat at any
          candidate cardinality.

    Skew bound: a score bucket holds the payloads its own pairs reference
    (~uniform under the golden-ratio hash) plus pairs/n_buckets pair rows;
    raise `n_buckets` when referenced-payload volume per bucket approaches
    worker heap.  An id's attach-side fan-out is its DISTINCT bucket
    count (<= n_buckets), so hot ids no longer concentrate memory.

    BROADCAST middle regime (r4, gated r5): when the candidate count fits
    `max_probe_pairs`, a driver-side referenced-id set (bounded at
    2 x max_probe_pairs int64s, ~64 MB at the default) filters payloads,
    their total bytes are summed DISTRIBUTED, and if they fit
    `max_broadcast_payload` both shuffles are skipped — the filtered dict
    ships once via ray.put and scoring is a plain map_batches over the
    pair stream.  The r4 flagship profile measured the two-shuffle path
    at 180s for 2.37M pairs whose referenced blobs total ~140 MB — the
    broadcast regime scores the same set in seconds.  Above
    `max_probe_pairs` (the 100-TB candidate regime) the probe is skipped
    ENTIRELY: no pair ids are ever collected on the driver, and the
    two-shuffle path runs with the attach-stage semi-join.
    """
    import ray

    # `payloads` may be a FACTORY (id_ref_or_None -> Dataset[(jid,
    # payload)]): the broadcast regime then hands it the referenced-id
    # ObjectRef so the caller can filter BEFORE building payload bytes —
    # e.g. minhash_dedup shingles only the candidate docs instead of
    # shingling the whole corpus and discarding ~2/3 of it (r5: ~7 core-s
    # off the flagship verify stage at sf0.1).
    payloads_factory = payloads if callable(payloads) else None

    # both regimes consume `pairs` twice — pin the lineage once
    pairs = pairs.materialize()
    if pairs.count() > max_probe_pairs:
        logger.info(
            "pairs_payload_metric: pair count exceeds max_probe_pairs=%d — "
            "skipping the broadcast probe; two-shuffle path with attach-side "
            "semi-join", max_probe_pairs)
        return _pairs_payload_metric_shuffle(
            pairs, payloads_factory(None) if payloads_factory else payloads,
            pair_metric, metric_name, n_buckets, carry,
            pair_metric_batch=pair_metric_batch, metric_min=metric_min)

    # probe regime: referenced ids (bounded by the gate above) stream to
    # the driver as per-batch uniques — never raw pair rows
    ab = [np.unique(np.concatenate([np.asarray(t.column("a"), np.int64),
                                    np.asarray(t.column("b"), np.int64)]))
          for t in pairs.select_columns(["a", "b"])
                        .iter_batches(batch_format="pyarrow", batch_size=65536)
          if t.num_rows]
    ref_ids = np.unique(np.concatenate(ab)) if ab else np.zeros(0, np.int64)
    id_ref = ray.put(ref_ids)

    def keep_referenced(t: pa.Table) -> pa.Table:
        return _filter_by_sorted_ids(t, ray.get(id_ref), "jid")

    referenced = (payloads_factory(id_ref) if payloads_factory
                  else payloads.map_batches(
                      keep_referenced, batch_format="pyarrow")).materialize()
    blob_bytes = int(referenced.map_batches(
        lambda t: {"nb": [int(pc.sum(pc.binary_length(
            t.column("payload"))).as_py() or 0)]},
        batch_format="pyarrow").sum("nb") or 0)
    if blob_bytes <= max_broadcast_payload:
        pdf = referenced.to_pandas()
        if pair_metric_batch is not None and not carry:
            # vectorized regime: payloads broadcast as a (sorted ids,
            # flat bytes, offsets) numpy triple — zero-copy through the
            # object store (a 100k-entry dict of bytes pickles; numpy
            # plasma buffers don't) — and scored one BATCH per call
            ids = pdf["jid"].to_numpy(np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            flat, off = _payload_store(pdf["payload"].to_numpy()[order])
            store_ref = ray.put((ids, flat, off))

            def score_vec(t: pa.Table) -> pa.Table:
                sids, flat_, off_ = ray.get(store_ref)
                a = np.asarray(t.column("a"), np.int64)
                b = np.asarray(t.column("b"), np.int64)
                m = pair_metric_batch(flat_, off_, _store_positions(sids, a),
                                      _store_positions(sids, b), metric_min)
                return pa.table({"a": pa.array(a), "b": pa.array(b),
                                 metric_name: pa.array(
                                     np.asarray(m, np.float64))})

            return pairs.map_batches(score_vec, batch_format="pyarrow",
                                     batch_size=65536)
        pmap_ref = ray.put(dict(zip(pdf["jid"].to_numpy(np.int64),
                                    pdf["payload"])))

        def score_broadcast(t: pa.Table) -> pa.Table:
            pmap = ray.get(pmap_ref)
            a = np.asarray(t.column("a"), np.int64)
            b = np.asarray(t.column("b"), np.int64)
            if carry:
                carries = [np.asarray(t.column(c), np.float64) for c in carry]
                m = [pair_metric(pmap.get(x, b"") or b"",
                                 pmap.get(y, b"") or b"",
                                 **{c: float(v[i])
                                    for c, v in zip(carry, carries)})
                     for i, (x, y) in enumerate(zip(a, b))]
            else:
                m = [pair_metric(pmap.get(x, b"") or b"",
                                 pmap.get(y, b"") or b"")
                     for x, y in zip(a, b)]
            return pa.table({"a": pa.array(a), "b": pa.array(b),
                             metric_name: pa.array(np.asarray(m, np.float64))})

        return pairs.map_batches(score_broadcast, batch_format="pyarrow",
                                 batch_size=65536)
    logger.info("pairs_payload_metric: referenced payloads %.0f MB exceed "
                "broadcast cap — two-shuffle path", blob_bytes / 1e6)
    return _pairs_payload_metric_shuffle(
        pairs, referenced, pair_metric, metric_name, n_buckets, carry,
        pair_metric_batch=pair_metric_batch, metric_min=metric_min)


def _pairs_payload_metric_shuffle(pairs, payloads, pair_metric,
                                  metric_name: str, n_buckets: int,
                                  carry: tuple, pair_metric_batch=None,
                                  metric_min: float = 0.0):
    """The fully-distributed two-shuffle scoring path (see
    `pairs_payload_metric`).  `payloads` may be unfiltered: the attach
    stage's inner merge IS the semi-join — unreferenced ids ship once
    through the first bucket shuffle and are dropped there.  With
    `pair_metric_batch`, each score bucket builds its payload store once
    and scores its pairs in one vectorized call (the same kernel as the
    broadcast regime, applied per bucket)."""
    REF_SCHEMA = pa.schema([("jid", pa.int64()), ("bucket2", pa.int32()),
                            ("payload", pa.large_binary()),
                            ("bucket", pa.int32())])

    def _b2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return ((a.astype(np.uint64) * _GOLD + b.astype(np.uint64))
                % np.uint64(n_buckets)).astype(np.int32)

    def explode_refs(t: pa.Table) -> pa.Table:
        # (jid, bucket2) per pair side, deduped per batch: what the attach
        # shuffle routes — bare ints, no payloads
        a = np.asarray(t.column("a"), np.int64)
        b = np.asarray(t.column("b"), np.int64)
        b2 = _b2(a, b)
        jid = np.concatenate([a, b])
        bb = np.concatenate([b2, b2])
        u = np.unique(np.stack([jid, bb.astype(np.int64)], axis=1), axis=0)
        jid, bb = u[:, 0], u[:, 1].astype(np.int32)
        return pa.table({
            "jid": pa.array(jid),
            "bucket2": pa.array(bb),
            "payload": pa.nulls(len(jid), pa.large_binary()),
            "bucket": pa.array(((jid.astype(np.uint64) * _GOLD)
                                % np.uint64(n_buckets)).astype(np.int32)),
        }, schema=REF_SCHEMA)

    def tag_payloads(t: pa.Table) -> pa.Table:
        jid = np.asarray(t.column("jid"), np.int64)
        return pa.table({
            "jid": pa.array(jid),
            "bucket2": pa.array(np.full(len(jid), -1, np.int32)),
            "payload": t.column("payload").cast(pa.large_binary()),
            "bucket": pa.array(((jid.astype(np.uint64) * _GOLD)
                                % np.uint64(n_buckets)).astype(np.int32)),
        }, schema=REF_SCHEMA)

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # one output payload row per DISTINCT (jid, score bucket)
        pay = g[g["bucket2"] < 0]
        refs = g[g["bucket2"] >= 0].drop_duplicates(["jid", "bucket2"])
        m = refs.merge(pay[["jid", "payload"]], on="jid", how="inner",
                       suffixes=("", "_p"))
        return pd.DataFrame({
            "jid": m["jid"].to_numpy(np.int64),
            "bucket2": m["bucket2"].to_numpy(np.int32),
            "payload": m["payload_p"]
                       if "payload_p" in m.columns else m["payload"],
        })

    PAIR_SCHEMA = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("jid", pa.int64()),
         ("payload", pa.large_binary()), ("is_pair", pa.int8()),
         ("bucket2", pa.int32())]
        + [(c, pa.float64()) for c in carry])

    def pair_rows(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("a"), np.int64)
        b = np.asarray(t.column("b"), np.int64)
        cols = {
            "a": pa.array(a), "b": pa.array(b),
            "jid": pa.array(np.zeros(len(a), np.int64)),
            "payload": pa.nulls(len(a), pa.large_binary()),
            "is_pair": pa.array(np.ones(len(a), np.int8)),
            "bucket2": pa.array(_b2(a, b)),
        }
        for c in carry:
            cols[c] = pa.array(np.asarray(t.column(c), np.float64))
        return pa.table(cols, schema=PAIR_SCHEMA)

    def payload_rows(t: pa.Table) -> pa.Table:
        jid = np.asarray(t.column("jid"), np.int64)
        z = np.zeros(len(jid), np.int64)
        cols = {
            "a": pa.array(z), "b": pa.array(z),
            "jid": pa.array(jid),
            "payload": t.column("payload").cast(pa.large_binary()),
            "is_pair": pa.array(np.zeros(len(jid), np.int8)),
            "bucket2": t.column("bucket2").cast(pa.int32()),
        }
        for c in carry:
            cols[c] = pa.array(np.zeros(len(jid), np.float64))
        return pa.table(cols, schema=PAIR_SCHEMA)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        pay = g[g["is_pair"] == 0]
        pr = g[g["is_pair"] == 1]
        if len(pr) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 metric_name: pd.Series([], dtype="float64")})
        a = pr["a"].to_numpy(np.int64)
        b = pr["b"].to_numpy(np.int64)
        if pair_metric_batch is not None and not carry:
            ids = pay["jid"].to_numpy(np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            flat, off = _payload_store(pay["payload"].to_numpy()[order])
            m = pair_metric_batch(flat, off, _store_positions(ids, a),
                                  _store_positions(ids, b), metric_min)
            return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                                 "b": pd.Series(b, dtype="int64"),
                                 metric_name: pd.Series(
                                     np.asarray(m, np.float64))})
        pmap = dict(zip(pay["jid"].to_numpy(np.int64), pay["payload"]))
        if carry:
            carries = [pr[c].to_numpy(np.float64) for c in carry]
            m = [pair_metric(pmap.get(x, b"") or b"", pmap.get(y, b"") or b"",
                             **{c: float(v[i]) for c, v in zip(carry, carries)})
                 for i, (x, y) in enumerate(zip(a, b))]
        else:
            m = [pair_metric(pmap.get(x, b"") or b"", pmap.get(y, b"") or b"")
                 for x, y in zip(a, b)]
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64"),
                             metric_name: pd.Series(m, dtype="float64")})

    deduped_payloads = (
        pairs.map_batches(explode_refs, batch_format="pyarrow")
        .union(payloads.map_batches(tag_payloads, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(attach, batch_format="pandas")
    )
    both = pairs.map_batches(pair_rows, batch_format="pyarrow").union(
        deduped_payloads.map_batches(payload_rows, batch_format="pyarrow"))
    return both.groupby("bucket2").map_groups(score, batch_format="pandas")


def _pool(want: int = 4) -> int:
    from nem_mms_ray.stages.encode_stage import default_pool_size

    return default_pool_size(want)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, key: str = "text", id_col: str = "doc_id"):
    """Survivors (min id per distinct key value). Returns Dataset[id, fp]."""
    from ray.data.aggregate import Min

    def add_fp(batch: pa.Table) -> pa.Table:
        from nem_mms_ray.ops.textstats import md5_hex_column

        return pa.table({id_col: batch.column(id_col),
                         "fp": pa.array(md5_hex_column(batch.column(key)))})

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min(id_col, alias_name=id_col))
    )


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------


# odd multipliers for the positional n-gram combine (uint64 wraparound)
# first 5 entries pin every existing n<=5 gram hash (oracle-checked);
# entries 6-16 (a splitmix64 stream, forced odd) extend the positional
# polynomial to the n=8..13 windows benchmark decontamination uses
_GRAM_MULT = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                       0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63,
                       0xE2AAC06220126021, 0x246E8D982BB2B96D,
                       0x01DF430E373212BD, 0x7F2BA67227183A51,
                       0xEF2298083637156F, 0xAB57CA4CD8942691,
                       0xED25F55EE0440287, 0xA773472FA44095B7,
                       0x42378AD4080EAD29, 0x6F2B9B5927A35C91,
                       0xB4CC78941DAD7B75], dtype=np.uint64)


def _combine_ngrams(hw: np.ndarray, n: int) -> np.ndarray:
    """Positional-polynomial combine of consecutive word hashes (vectorized):
    gram_i = sum_j hw[i+j] * MULT[j].  Short docs (<n words) collapse to one
    gram over all words, matching the join-all behavior of the string path."""
    k = len(hw)
    if k == 0:
        return np.zeros(0, np.uint64)
    if k < n:
        return np.unique((hw * _GRAM_MULT[:k]).sum(dtype=np.uint64, keepdims=True))
    g = np.zeros(k - n + 1, np.uint64)
    for j in range(n):
        g += hw[j : k - n + 1 + j] * _GRAM_MULT[j]
    return np.unique(g)


def _batch_word_ngrams(texts, n: int = 3) -> list[np.ndarray]:
    """Shingle sets for a whole batch with ONE vectorized word-hash call.

    Accepts an Arrow string column (fast path: C whitespace split +
    dictionary-encode, so only the VOCABULARY is hashed as Python
    objects — measured 2.7x over the list path on web text and
    shingle-identical) or a list of str (legacy).  Word hashes are
    pd.util.hash_array per distinct word + a vectorized polynomial
    combine; both paths produce identical sets (the hash is per-value,
    so hashing each vocab entry once equals hashing every occurrence).

    The Arrow split goes through textkernels.split_whitespace_padded
    (str.split() semantics + the pyarrow 16.1 buffer-boundary OOB
    workaround); unlike tokenize_column, no lowercasing — shingles are
    case-sensitive to match the SQL oracle's string_split(text, ' ')."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        from nem_mms_ray.ops.textkernels import split_whitespace_padded

        col = pc.fill_null(texts, "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ndocs = len(col)
        flat, di = split_whitespace_padded(col)
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary.to_numpy(zero_copy_only=False)
        vh = (pd.util.hash_array(vocab, categorize=False).astype(np.uint64)
              if len(vocab) else np.zeros(0, np.uint64))
        hflat = vh[codes]
        counts = np.bincount(di, minlength=ndocs)
        out, pos = [], 0
        for c in counts:
            out.append(_combine_ngrams(hflat[pos:pos + c], n))
            pos += c
        return out
    words_per = [(t or "").split() for t in texts]
    flat = [w for ws in words_per for w in ws]
    if flat:
        hflat = pd.util.hash_array(np.asarray(flat, dtype=object),
                                   categorize=False).astype(np.uint64)
    else:
        hflat = np.zeros(0, np.uint64)
    out = []
    pos = 0
    for ws in words_per:
        hw = hflat[pos : pos + len(ws)]
        pos += len(ws)
        out.append(_combine_ngrams(hw, n))
    return out


def _word_ngrams(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-grams (the shingle set) of one document."""
    return _batch_word_ngrams([text], n)[0]


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P61), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P61), num_perm, dtype=np.uint64)
    return a, b


def _minhash(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(shingles) == 0:
        return np.full(len(a), int(_P61), np.uint64)
    # (a*x + b) mod p per permutation; uint64 wrap-around then mod keeps
    # determinism (not a true mod-p universal hash but stable + well-mixed)
    x = shingles[None, :] * a[:, None] + b[:, None]
    return (x % _P61).min(axis=1)


class MinHashStage:
    """Stateful stage: doc -> minhash signature -> LSH band keys.

    Permutation parameters built once per worker (cached), applied per
    batch; emits one row per (doc, band) ready for the band groupby.  Band
    keys are a positional-polynomial combine of the band's signature rows
    (vectorized, uint64 wraparound) — identical band vectors always map to
    identical keys, and the rare combine collision only adds a candidate
    pair that exact-Jaccard verification then rejects.
    """

    def __init__(self, num_perm: int = 128, bands: int = 16, ngram: int = 3,
                 seed: int = 42, id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        rng = np.random.default_rng(seed + 987)
        self.band_mult = (rng.integers(0, 1 << 63, self.rows_per_band,
                                       dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.ngram = ngram
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col), dtype=np.int64)
        shingle_sets = _batch_word_ngrams(batch.column(self.text_col),
                                          self.ngram)
        nb = self.bands
        from nem_mms_ray.ops._setops_native import minhash_signatures

        sigs = minhash_signatures(shingle_sets, self.a, self.b)
        if sigs is not None:
            # C kernel: whole batch in one call (the 128-perm running-min
            # array stays in L1; the Mersenne mod replaces the u64 div),
            # bit-identical to the per-doc numpy path below.  Band keys
            # then combine fully vectorized over (docs, bands, rows).
            keys = (sigs.reshape(len(ids), nb, self.rows_per_band)
                    * self.band_mult).sum(axis=2, dtype=np.uint64)
        else:
            # NOTE: per-doc hashing is the fast numpy shape — shingle sets
            # are small, so each (num_perm, n_shingles) matrix stays
            # cache-resident; a batch-concatenated matrix + minimum.reduceat
            # was measured 15x SLOWER (200 MB working set, reduceat overhead)
            keys = np.empty((len(ids), nb), np.uint64)
            for i, sh in enumerate(shingle_sets):
                sig = _minhash(sh, self.a, self.b)
                keys[i] = (sig.reshape(nb, self.rows_per_band)
                           * self.band_mult).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, nb), type=pa.int64()),
                "band": pa.array(np.tile(np.arange(nb, dtype=np.int32), len(ids))),
                "band_key": pa.array(keys.reshape(-1).view(np.int64)),
            }
        )


_WORKER_MINHASH: dict = {}


def _minhash_task(batch: pa.Table, **kw) -> pa.Table:
    """Task-mode wrapper: warm Ray workers cache the stage (permutation
    params) across tasks like an actor would, without actor-pool ramp-up."""
    key = tuple(sorted(kw.items()))
    st = _WORKER_MINHASH.get(key)
    if st is None:
        st = _WORKER_MINHASH[key] = MinHashStage(**kw)
    return st(batch)


def _pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """All candidate pairs inside one coarse bucket.  Coarse bucketing keeps
    the Ray group count at ~n_buckets instead of one Ray group per LSH key —
    per-group task overhead dominates otherwise (measured 13.7s -> <1s on
    80k keys).

    Fully vectorized (r5): one lexsort finds the fine (band, band_key)
    groups and de-dups docs within each; pair expansion then runs once per
    DISTINCT GROUP SIZE (all size-s groups expand through one shared
    triu_indices broadcast) instead of once per group — the per-group
    Python loop was 32 core-s on the sf0.1 flagship's 1.85M rows / ~100k
    multi-doc keys, larger than the minhash pass itself.  Pair SET is
    identical to the per-group path (same sorted-unique docs, same a < b
    expansion, same >200 chain-to-min skew guard); only row order differs,
    and every consumer (distinct, verify shuffle) is order-insensitive."""
    band = g["band"].to_numpy(np.int64)
    key = g["band_key"].to_numpy(np.int64)
    doc = g["doc_id"].to_numpy(np.int64)
    empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64")})
    if not len(doc):
        return empty
    order = np.lexsort((doc, key, band))
    band, key, doc = band[order], key[order], doc[order]
    new_grp = np.empty(len(doc), np.bool_)
    new_grp[0] = True
    new_grp[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    dup = np.zeros(len(doc), np.bool_)
    dup[1:] = ~new_grp[1:] & (doc[1:] == doc[:-1])
    if dup.any():  # same doc under the same key (duplicate signature rows)
        keep = ~dup
        doc, new_grp = doc[keep], new_grp[keep]
    starts = np.nonzero(new_grp)[0]
    sizes = np.diff(np.append(starts, len(doc)))
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    big = sizes > 200  # skew guard: degenerate key (e.g. empty docs)
    for s0, sz in zip(starts[big], sizes[big]):
        ca, cb = _chain_to_min(doc[s0:s0 + sz], "minhash LSH")
        out_a.append(ca)
        out_b.append(cb)
    norm = ~big & (sizes >= 2)
    nstarts, nsizes = starts[norm], sizes[norm]
    for s in np.unique(nsizes):
        gs = nstarts[nsizes == s]
        ai, bi = np.triu_indices(int(s), k=1)
        out_a.append(doc[(gs[:, None] + ai[None, :]).ravel()])
        out_b.append(doc[(gs[:, None] + bi[None, :]).ravel()])
    if not out_a:
        return empty
    return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})


def _minhash_raw_pairs(ds, num_perm: int, bands: int, ngram: int, n_buckets: int):
    """Dataset[(a, b)] of LSH candidate pairs, possibly repeated across bands."""
    import functools

    sig = ds.map_batches(
        functools.partial(_minhash_task, num_perm=num_perm, bands=bands, ngram=ngram),
        batch_format="pyarrow",
        num_cpus=1,
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.asarray(t.column("band"), dtype=np.int64).astype(np.uint64)
        k = np.asarray(t.column("band_key"), dtype=np.int64).view(np.uint64)
        h = b * np.uint64(0x9E3779B97F4A7C15) + k
        return t.append_column("bucket", pa.array((h % n_buckets).astype(np.int32)))

    # NOTE (measured, r3): do NOT materialize/repartition the keyed rows
    # before this groupby to "right-size" blocks — the barrier kills the
    # signature->shuffle streaming overlap and costs ~3x the per-block
    # fixed overhead it saves (interleaved A/B: 1.6-4.0s without vs
    # 4.6-5.6s with, sf0.1 @ 8 CPUs)
    return (
        sig.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pairs_in_bucket, batch_format="pandas")
    )


def bucketed_pair_agg(pairs, pd_agg, n_buckets: int = 64,
                      pre_combine: bool = True):
    """Aggregate rows sharing an (a, b) pair key via ONE coarse-bucket
    shuffle + a vectorized pandas aggregation per bucket.

    Ray Data's hash groupby degrades when the number of DISTINCT keys is
    large: groupby(["a","b"]).aggregate(Count) over 5.7M candidate rows /
    2.37M distinct pairs measured 605s (r4 flagship profile) where this
    shape — hash(a,b) %% n_buckets, then pandas inside each of the
    n_buckets groups — runs the identical aggregation in seconds.  All
    rows of one pair land in one bucket, so per-pair results are exact,
    and the bucket count bounds Ray group count at any candidate scale
    (the repo's standard coarse-bucket pattern).

    `pd_agg` must be a CLOSED aggregation over same-named columns
    (distinct / min / max / sum compose with themselves): with
    `pre_combine` it also runs per input batch as a combiner before the
    shuffle, cutting exchange volume — exactly the class of aggregations
    used by the dedup candidate paths.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        if pre_combine and t.num_rows:
            t = pa.Table.from_pandas(pd_agg(t.to_pandas()),
                                     preserve_index=False)
        a = np.asarray(t.column("a"), np.int64).astype(np.uint64)
        b = np.asarray(t.column("b"), np.int64).astype(np.uint64)
        h = ((a * _GOLD + b) % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("pbucket", pa.array(h))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd_agg(g.drop(columns=["pbucket"]))

    return (pairs.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("pbucket").map_groups(per_bucket,
                                           batch_format="pandas"))


def _pd_distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
    return g.drop_duplicates(["a", "b"])[["a", "b"]]


def minhash_candidate_pairs(ds, num_perm: int = 128, bands: int = 16,
                            ngram: int = 3, concurrency: int | None = None,
                            n_buckets: int = 128):
    """Dataset[(a, b)] of LSH candidate pairs (a < b, distinct).

    The distinct step is a Ray groupby (a pair may surface from several
    bands) — the scale path when the candidate set itself is large.
    `minhash_dedup` instead dedupes driver-side on the (small) collected
    candidate set, saving this shuffle."""
    pairs = _minhash_raw_pairs(ds, num_perm, bands, ngram, n_buckets)
    return bucketed_pair_agg(pairs, _pd_distinct_pairs)


def _gram_pairs_in_bucket(g: pd.DataFrame, id_col: str,
                          max_gram_df: int | None,
                          emit_stats: bool = False) -> pd.DataFrame:
    """Per-gram doc pairs inside one coarse bucket, with the frequent-gram
    skew guard: a gram shared by > max_gram_df docs is excluded from pair
    generation (a stop-gram shared by M docs would emit M^2/2 pairs — the
    quadratic blow-up VERDICT r2 flagged).  Dropped grams are logged, per
    the no-silent-caps rule; with `emit_stats` they ALSO ride the data
    plane as one sentinel row per bucket (cnt=-1, na=dropped gram count,
    nb=max doc freq seen) so the caller can aggregate recall loss instead
    of scraping logs (ADVICE r4).  Each pair carries both docs' total set
    sizes (the "sz" column the explode stage stamped on every gram row),
    so the downstream jaccard needs no second pass over the corpus."""
    if max_gram_df is None:
        max_gram_df = np.iinfo(np.int64).max  # no cap: fully exact
    empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64"),
                          "cnt": pd.Series([], dtype="int64"),
                          "na": pd.Series([], dtype="int64"),
                          "nb": pd.Series([], dtype="int64")})
    gram = g["gram"].to_numpy(np.int64)
    doc = g[id_col].to_numpy(np.int64)
    sz = g["sz"].to_numpy(np.int64)
    dropped = 0
    max_df_seen = 0
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_na: list[np.ndarray] = []
    out_nb: list[np.ndarray] = []
    if len(doc):
        # vectorized per-gram grouping (r5, the _pairs_in_bucket shape):
        # one lexsort, doc de-dup within gram, then pair expansion once per
        # DISTINCT per-gram doc count via a shared triu broadcast.  sz is
        # constant per doc, so any representative row matches the old
        # drop_duplicates-first semantics.
        order = np.lexsort((doc, gram))
        gram, doc, sz = gram[order], doc[order], sz[order]
        new_grp = np.empty(len(doc), np.bool_)
        new_grp[0] = True
        new_grp[1:] = gram[1:] != gram[:-1]
        dup = np.zeros(len(doc), np.bool_)
        dup[1:] = ~new_grp[1:] & (doc[1:] == doc[:-1])
        if dup.any():
            keep = ~dup
            doc, sz, new_grp = doc[keep], sz[keep], new_grp[keep]
        starts = np.nonzero(new_grp)[0]
        sizes = np.diff(np.append(starts, len(doc)))
        # skew guard: stop-gram M^2/2 blow-up; singletons are SKIPPED, not
        # dropped (the scalar path's check order), so a degenerate cap < 2
        # never counts them against recall
        big = (sizes > max_gram_df) & (sizes >= 2)
        dropped = int(big.sum())
        max_df_seen = int(sizes[big].max()) if dropped else 0
        norm = ~big & (sizes >= 2)
        nstarts, nsizes = starts[norm], sizes[norm]
        for s in np.unique(nsizes):
            gs = nstarts[nsizes == s]
            ai, bi = np.triu_indices(int(s), k=1)
            ia = (gs[:, None] + ai[None, :]).ravel()
            ib = (gs[:, None] + bi[None, :]).ravel()
            out_a.append(doc[ia])
            out_b.append(doc[ib])
            out_na.append(sz[ia])
            out_nb.append(sz[ib])
    if dropped:
        logger.warning(
            "ngram_jaccard: dropped %d frequent gram(s) from pair generation "
            "(doc freq > %d, max seen %d) — jaccard for pairs sharing only "
            "those grams is a lower bound", dropped, max_gram_df, max_df_seen)
    stats = pd.DataFrame({"a": [0], "b": [0], "cnt": [-1],
                          "na": [dropped], "nb": [max_df_seen]}
                         ).astype("int64") if emit_stats and dropped else None
    if not out_a:
        return empty if stats is None else stats
    # per-pair aggregate (cnt = shared-gram count = |intersection|),
    # vectorized: sort pairs, run-length the (a, b) groups
    A = np.concatenate(out_a)
    B = np.concatenate(out_b)
    NA = np.concatenate(out_na)
    NB = np.concatenate(out_nb)
    o = np.lexsort((B, A))
    A, B, NA, NB = A[o], B[o], NA[o], NB[o]
    ng = np.empty(len(A), np.bool_)
    ng[0] = True
    ng[1:] = (A[1:] != A[:-1]) | (B[1:] != B[:-1])
    ps = np.nonzero(ng)[0]
    cnt = np.diff(np.append(ps, len(A)))
    agg = pd.DataFrame({"a": A[ps], "b": B[ps], "cnt": cnt.astype(np.int64),
                        "na": NA[ps], "nb": NB[ps]})
    return agg if stats is None else pd.concat([agg, stats],
                                               ignore_index=True)


def ngram_jaccard_pairs(ds, threshold: float = 0.2, ngram: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_buckets: int = 256, max_gram_df: int | None = None,
                        return_dropped_stats: bool = False):
    """EXACT n-gram Jaccard pairs (no LSH): Dataset[(a, b, jaccard)], a < b.

    Distributed shape: ONE explode pass emits (doc, gram, bucket, sz) where
    sz is the doc's total distinct-gram count stamped on every gram row ->
    group by gram (coarse-bucketed like the LSH path) -> per-gram doc pairs
    carrying (na, nb) -> sum shared-gram counts per pair (= |intersection|,
    grams are distinct per doc) -> jaccard = inter / (na + nb - inter)
    computed per batch.  Carrying sz on the exploded rows costs 8 B/gram but
    removes the r2 anti-patterns: no second shingle pass for sizes, no
    driver-side size dict, no extra ds.count() probe (VERDICT r2 findings
    1-2, ADVICE r2).  Only intersecting pairs materialize, so cost scales
    with gram sharing, not n^2; docs without grams produce no rows.

    max_gram_df is an OPT-IN cap on per-gram document frequency for pair
    generation (see _gram_pairs_in_bucket).  The default (None) preserves
    the exact contract: a duplicate set of ANY size produces its pairs —
    a default cap would silently emit zero pairs for boilerplate shared
    by more docs than the cap, exactly the case exact dedup targets
    (ADVICE r3).  At web scale, run exact/near dedup FIRST and then set
    max_gram_df to bound the M^2/2 pair blow-up of residual stop-grams;
    with a cap set, reported jaccard is a lower bound for pairs whose
    shared grams were dropped (dropped grams are logged, never silent).
    `return_dropped_stats=True` additionally returns (pairs, stats) where
    stats = {"dropped_grams", "max_gram_df_seen"} aggregated from
    per-bucket sentinel rows — the recall-loss signal as DATA a pipeline
    can alert on, not just a log line (ADVICE r4).  It materializes the
    per-gram intersection stream once (it is consumed by both the stats
    aggregate and the pair path), so reserve it for capped runs — which
    are the bounded-pair regime anyway.  The DuckDB oracle mirrors the
    uncapped exact semantics over the literal gram strings."""
    import functools

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        sets = _batch_word_ngrams(batch.column(text_col), ngram)
        counts = np.array([len(s) for s in sets], np.int64)
        grams = np.concatenate(sets) if sets else np.zeros(0, np.uint64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, counts)),
            "gram": pa.array(grams.view(np.int64)),
            "bucket": pa.array((grams % n_buckets).astype(np.int32)),
            "sz": pa.array(np.repeat(counts, counts)),
        })

    inter = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(functools.partial(_gram_pairs_in_bucket, id_col=id_col,
                                      max_gram_df=max_gram_df,
                                      emit_stats=return_dropped_stats),
                    batch_format="pandas")
    )
    stats = None
    if return_dropped_stats:
        inter = inter.materialize()
        srows = inter.map_batches(
            lambda t: t.filter(pc.less(t.column("cnt"), 0)),
            batch_format="pyarrow").to_pandas()
        empty = srows.empty or "na" not in srows  # no drops: schema may vanish
        stats = {"dropped_grams": 0 if empty else int(srows["na"].sum()),
                 "max_gram_df_seen": 0 if empty else int(srows["nb"].max())}
        inter = inter.map_batches(
            lambda t: t.filter(pc.greater(t.column("cnt"), 0)),
            batch_format="pyarrow")
    inter = bucketed_pair_agg(
        inter,
        lambda g: g.groupby(["a", "b"], as_index=False)
                   .agg({"cnt": "sum", "na": "max", "nb": "max"}))

    def score(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        i = np.asarray(batch.column("cnt"), dtype=np.int64)
        na = np.asarray(batch.column("na"), dtype=np.int64)
        nb = np.asarray(batch.column("nb"), dtype=np.int64)
        j = i / (na + nb - i)
        keep = j >= threshold
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                         "jaccard": pa.array(np.round(j[keep], 6))})

    scored = inter.map_batches(score, batch_format="pyarrow")
    return (scored, stats) if return_dropped_stats else scored


def jaccard(text_a: str, text_b: str, ngram: int = 3) -> float:
    sa, sb = _word_ngrams(text_a, ngram), _word_ngrams(text_b, ngram)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def _jaccard_blobs(pa_: bytes, pb_: bytes) -> float:
    """Jaccard of two serialized uint64 shingle sets (tobytes of np.unique)."""
    sa = np.frombuffer(pa_, np.uint64)
    sb = np.frombuffer(pb_, np.uint64)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0  # caller thresholds then rounds


def _shingle_blobs(batch: pa.Table, ngram: int, id_col: str, text_col: str) -> pa.Table:
    """(jid, payload) rows: each doc's shingle set serialized once."""
    ids = np.asarray(batch.column(id_col), dtype=np.int64)
    blobs = [s.tobytes() for s in
             _batch_word_ngrams(batch.column(text_col), ngram)]
    return pa.table({"jid": pa.array(ids, pa.int64()),
                     "payload": pa.array(blobs, pa.large_binary())})


def minhash_dedup(ds, threshold: float = 0.8, num_perm: int = 128,
                  bands: int = 16, ngram: int = 3,
                  max_broadcast_pairs: int = 50_000,
                  verify_buckets: int = 64):
    """Near-dup pairs verified by exact n-gram Jaccard >= threshold.

    Returns Dataset[(a, b, jaccard)].  Verify auto-selects by candidate
    count: small sets broadcast the candidate docs' shingles via ray.put
    (no shuffle); above `max_broadcast_pairs` raw candidates, a distributed
    shuffle-join (`pairs_payload_metric`) attaches each side's shingle blob
    and scores per pair — nothing materializes on the driver, so millions
    of candidates with GB-scale shingle payloads stay worker-side.
    `verify_buckets` sizes that join's attach tasks (ADVICE r2): raise it
    when referenced-payload volume per bucket (≈ candidate docs x blob
    size / verify_buckets) approaches worker heap.
    """
    import ray

    raw = _minhash_raw_pairs(ds, num_perm, bands, ngram, n_buckets=128).materialize()
    if raw.count() > max_broadcast_pairs:
        cand = bucketed_pair_agg(raw, _pd_distinct_pairs)

        def payloads(id_ref=None):
            """Shingle-blob factory: with the verify stage's referenced-id
            ref, docs in no candidate pair are dropped BEFORE shingling
            (the shingle pass is the payload cost — on the sf0.1 flagship
            ~2/3 of docs are unreferenced, so filter-then-shingle saves
            ~7 core-s vs shingle-then-filter)."""
            def shingle_filtered(batch: pa.Table) -> pa.Table:
                if id_ref is not None:  # ref ids are np.unique output: sorted
                    batch = _filter_by_sorted_ids(batch, ray.get(id_ref),
                                                  "doc_id")
                return _shingle_blobs(batch, ngram=ngram, id_col="doc_id",
                                      text_col="text")

            return ds.map_batches(shingle_filtered, batch_format="pyarrow")

        scored = pairs_payload_metric(cand, payloads, _jaccard_blobs, "jaccard",
                                      n_buckets=verify_buckets,
                                      pair_metric_batch=_jaccard_store_batch,
                                      metric_min=threshold)

        def keep(t: pa.Table) -> pa.Table:
            j = np.asarray(t.column("jaccard"), np.float64)
            m = j >= threshold
            return pa.table({"a": t.column("a").filter(pa.array(m)),
                             "b": t.column("b").filter(pa.array(m)),
                             "jaccard": pa.array(np.round(j[m], 6))})

        return scored.map_batches(keep, batch_format="pyarrow")

    pairs = raw.to_pandas()
    # candidates are collected driver-side anyway for the broadcast verify,
    # so the cross-band distinct is a free pandas op here, not a Ray shuffle
    pairs = pairs.drop_duplicates(["a", "b"], ignore_index=True)
    if len(pairs) == 0:
        return ray.data.from_items([]).map_batches(
            lambda b: pa.table({"a": pa.array([], pa.int64()),
                                "b": pa.array([], pa.int64()),
                                "jaccard": pa.array([], pa.float64())}),
            batch_format="pyarrow",
        )
    need = np.unique(np.concatenate([pairs["a"].values, pairs["b"].values]))

    def shingles_needed(batch: pa.Table) -> pa.Table:
        """Shingle each candidate doc ONCE (docs recur across many pairs)."""
        all_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        mask = np.isin(all_ids, need)
        texts = batch.column("text").take(pa.array(np.nonzero(mask)[0]))
        blobs = [s.tobytes() for s in _batch_word_ngrams(texts, ngram)]
        return pa.table({"doc_id": pa.array(all_ids[mask], pa.int64()),
                         "sh": pa.array(blobs, pa.binary())})

    sh_tbl = ds.map_batches(shingles_needed, batch_format="pyarrow").to_pandas()
    sids = sh_tbl["doc_id"].to_numpy(np.int64)
    order = np.argsort(sids)
    sids = sids[order]
    sh_flat, sh_off = _payload_store(sh_tbl["sh"].to_numpy()[order])
    sh_ref = ray.put((sids, sh_flat, sh_off))

    def verify(batch: pa.Table) -> pa.Table:
        ids, flat, off = ray.get(sh_ref)
        a = np.asarray(batch.column("a"), np.int64)
        b = np.asarray(batch.column("b"), np.int64)
        j = _jaccard_store_batch(flat, off, _store_positions(ids, a),
                                 _store_positions(ids, b),
                                 min_metric=threshold)
        keep = j >= threshold
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64()),
                         "jaccard": pa.array(np.round(j[keep], 6))})

    import ray.data as rd

    nblocks = max(4, min(64, len(pairs) // 64 + 1))
    return rd.from_pandas(pairs).repartition(nblocks).map_batches(
        verify, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """64-bit SimHash per doc: sign-sum of token-hash bit vectors.

    Word hashes for the whole batch come from ONE vectorized hash_array
    call; the per-doc bit expansion stays small (words x 64 int8).
    Whole-batch alternatives were A/B-measured (r4, sf0.1 documents,
    5000 docs): a (tokens x 64) int32 sign matrix + add.reduceat ran
    11x slower and an unpackbits bit-sliced variant 2x slower than this
    loop — the per-doc matrices fit cache, the whole-batch intermediates
    (150 MB at ~600k tokens) do not.  The loop stays."""
    texts = batch.column(text_col).to_pylist()
    words_per = [(t or "").split() for t in texts]
    flat = [w for ws in words_per for w in ws]
    if flat:
        hflat = pd.util.hash_array(np.asarray(flat, dtype=object),
                                   categorize=False).astype(np.uint64)
    else:
        hflat = np.zeros(0, np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    powers = (np.uint64(1) << shifts)
    out = np.zeros(len(texts), np.uint64)
    pos = 0
    for i, ws in enumerate(words_per):
        k = len(ws)
        if k == 0:
            continue
        hs = hflat[pos : pos + k]
        pos += k
        bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int8)
        v = (2 * bits.astype(np.int32) - 1).sum(axis=0)
        out[i] = (powers * (v > 0)).sum(dtype=np.uint64)
    return pa.table({id_col: batch.column(id_col),
                     "simhash": pa.array(out.view(np.int64))})


def simhash_near_pairs(ds, max_hamming: int = 3, prefix_bits: int = 16):
    """Near-dup pairs by SimHash: bucket on each of 4 16-bit bands (any band
    equal -> candidate), verify Hamming distance <= max_hamming."""
    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        sh = np.asarray(batch.column("simhash"), np.int64).view(np.uint64)
        n = len(ids)
        bands = np.tile(np.arange(4, dtype=np.int32), n)
        keys = ((sh[:, None] >> (np.uint64(16) * np.arange(4, dtype=np.uint64)))
                & np.uint64(0xFFFF)).astype(np.int32).reshape(-1)
        return pa.table({"doc_id": pa.array(np.repeat(ids, 4)),
                         "band": pa.array(bands),
                         "key": pa.array(keys),
                         "simhash": pa.array(np.repeat(sh.view(np.int64), 4))})

    def pairs_in_coarse_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized fine groupby within a coarse bucket (see minhash note)."""
        out = []
        for _, sub in g.groupby(["band", "key"]):
            sub = sub.drop_duplicates("doc_id").sort_values("doc_id")
            if len(sub) < 2:
                continue
            ids = sub["doc_id"].values
            sh = sub["simhash"].values.astype(np.int64).astype(np.uint64)
            if len(sub) > 200:  # skew guard: chain to min id, O(n) pairs
                ai, bi = _chain_to_min(np.arange(len(ids)), "simhash")
            else:
                ai, bi = np.triu_indices(len(ids), k=1)
            x = sh[ai] ^ sh[bi]
            ham = _popcount64(x)
            keep = ham <= max_hamming
            if keep.any():
                out.append(pd.DataFrame({"a": ids[ai][keep], "b": ids[bi][keep],
                                         "hamming": ham[keep]}))
        if not out:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.asarray(t.column("band"), dtype=np.int64)
        k = np.asarray(t.column("key"), dtype=np.int64)
        return t.append_column(
            "bucket", pa.array(((b * 65537 + k) % 128).astype(np.int32))
        )

    sig = ds.map_batches(simhash_batch, batch_format="pyarrow")
    pairs = sig.map_batches(explode, batch_format="pyarrow") \
               .map_batches(add_bucket, batch_format="pyarrow") \
               .groupby("bucket").map_groups(pairs_in_coarse_bucket, batch_format="pandas")
    return bucketed_pair_agg(
        pairs,
        lambda g: g.groupby(["a", "b"], as_index=False)["hamming"].min())


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


_WORKER_PLANES: dict = {}


def _lsh_planes(seed: int, n_tables: int, dim: int, n_planes: int) -> np.ndarray:
    """Hyperplane tensor, built once per worker process and cached (the
    per-batch regeneration was r1 VERDICT item 3)."""
    key = (seed, n_tables, dim, n_planes)
    p = _WORKER_PLANES.get(key)
    if p is None:
        p = _WORKER_PLANES[key] = np.random.default_rng(seed).standard_normal(
            (n_tables, dim, n_planes))
    return p


def _cosine_blobs(pa_: bytes, pb_: bytes) -> float:
    va = np.frombuffer(pa_, np.float64)
    vb = np.frombuffer(pb_, np.float64)
    if len(va) == 0 or len(vb) == 0:
        return 0.0
    na, nb = np.linalg.norm(va), np.linalg.norm(vb)
    if na == 0 or nb == 0:
        return 0.0
    return float(va @ vb / (na * nb))  # caller thresholds then rounds


def embedding_near_pairs(ds, threshold: float = 0.95, n_planes: int = 12,
                         n_tables: int = 4, seed: int = 42,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         n_buckets: int = 128, verify_buckets: int = 64):
    """Cosine near-dup via multi-table random-hyperplane LSH + exact verify.

    Scale path (exact baseline: `ann.cosine_pairs_exact`): each vector lands
    in one sign bucket per table; vectors sharing a bucket in ANY of the
    `n_tables` tables are candidates, verified by exact cosine.  One table of
    b planes misses a near-identical pair with prob ~1-(1-theta/pi)^b (~10%
    at b=12); OR-ing L independent tables drives the miss rate to that to the
    Lth power.

    Shuffle discipline (r1 VERDICT item 3): the candidate stage moves ONLY
    (bucket, key, vec_id) int rows — raw vectors never replicate through the
    xN-tables shuffle.  Verification shuffle-joins each pair's two vectors
    via `pairs_payload_metric` (vector payload moves once per side).
    Deterministic: planes from a fixed seed, cached per worker.
    """
    from nem_mms_ray.ops.ann import _to_matrix

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = _to_matrix(batch.column(vec_col))
        planes = _lsh_planes(seed, n_tables, vecs.shape[1], n_planes)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        out_id, out_key = [], []
        for t in range(n_tables):
            signs = (vecs @ planes[t]) >= 0
            keys = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
            out_id.append(ids)
            out_key.append(keys + (t << n_planes))  # fine key: (table, bucket)
        key = np.concatenate(out_key)
        return pa.table({id_col: pa.array(np.concatenate(out_id)),
                         "key": pa.array(key),
                         "bucket": pa.array((key % n_buckets).astype(np.int32))})

    def cand_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs for all fine buckets in one coarse group."""
        out_a, out_b = [], []
        for _, sub in g.groupby("key"):
            u = np.sort(sub[id_col].unique())
            if len(u) < 2:
                continue
            if len(u) > 500:  # skew guard: chain to min id, O(n) pairs
                ca, cb = _chain_to_min(u, "embedding LSH")
                out_a.append(ca)
                out_b.append(cb)
                continue
            ai, bi = np.triu_indices(len(u), k=1)
            out_a.append(u[ai])
            out_b.append(u[bi])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    def vec_blobs(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column(vec_col))
        return pa.table({
            "jid": batch.column(id_col).cast(pa.int64()),
            "payload": pa.array([m[i].tobytes() for i in range(len(m))],
                                pa.large_binary()),
        })

    cand = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cand_in_bucket, batch_format="pandas")
    )
    # a pair can surface from several tables: distinct before verify
    cand = bucketed_pair_agg(cand, _pd_distinct_pairs)
    scored = pairs_payload_metric(
        cand, ds.map_batches(vec_blobs, batch_format="pyarrow"),
        _cosine_blobs, "cosine", n_buckets=verify_buckets)

    def keep(t: pa.Table) -> pa.Table:
        c = np.asarray(t.column("cosine"), np.float64)
        m = c >= threshold
        return pa.table({"a": t.column("a").filter(pa.array(m)),
                         "b": t.column("b").filter(pa.array(m)),
                         "cosine": pa.array(np.round(c[m], 6))})

    return scored.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# pair clusters (the dedup endgame: pairs -> components -> representative)
# ---------------------------------------------------------------------------


#: target edge rows per hash-join partition when sizing from the edge list
_EDGE_ROWS_PER_PARTITION = 1_000_000


def _join_partitions(requested: int | None = None,
                     edge_rows: int | None = None,
                     cpus: int | None = None) -> int:
    """Partition count for Dataset.join: its hash aggregators are actors
    that each need a CPU slot, so requesting more partitions than the
    cluster has CPUs deadlocks small sessions (observed at 4-CPU pytest).
    The cap is therefore always cpus//2 (join uses two actor pools).

    With `edge_rows`, size from the data: ~1M edge rows (~16 MB) per
    partition, so a 100-TB run's edge list spreads across the cluster
    instead of 16 aggregators (VERDICT r3 finding 2); without it, a fixed
    16 ceiling keeps small interactive sessions snappy."""
    if requested:
        return requested
    if cpus is None:
        import ray

        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            cpus = 4
    cap = max(2, cpus // 2)
    if edge_rows:
        derived = -(-edge_rows // _EDGE_ROWS_PER_PARTITION)  # ceil div
        return max(2, min(cap, derived))
    return min(16, cap)


def _streamed_unique_ids(raw, ceiling: int) -> np.ndarray | None:
    """Sorted distinct int64 ids over a (a, b) pair Dataset, streamed:
    per-batch uniques accumulate in a buffer that compacts (one merged
    np.unique) whenever it outgrows the current union — memory stays
    O(distinct + slack), never O(edges).  None as soon as the distinct
    count provably exceeds `ceiling` (the caller falls back to the
    distributed regime without finishing the pass)."""
    cur = np.zeros(0, np.int64)
    buf: list[np.ndarray] = []
    bufn = 0
    for t in raw.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        if not t.num_rows:
            continue
        u = np.unique(np.concatenate([np.asarray(t.column("a"), np.int64),
                                      np.asarray(t.column("b"), np.int64)]))
        buf.append(u)
        bufn += len(u)
        if bufn >= max(len(cur), 4 << 20):
            cur = np.unique(np.concatenate([cur, *buf]))
            buf, bufn = [], 0
            if len(cur) > ceiling:
                return None
    if buf:
        cur = np.unique(np.concatenate([cur, *buf]))
    return cur if len(cur) <= ceiling else None


def connected_components(pairs, max_iters: int = 25,
                         num_partitions: int | None = None,
                         max_local_edges: int = 5_000_000,
                         max_local_nodes: int = 50_000_000):
    """Dataset[(id, component)] for every node appearing in the pair list:
    component = the MINIMUM id reachable through the pair graph — the
    canonical representative a dedup run keeps.

    Three regimes, chosen by measured crossovers:

    1. LOCAL (<= `max_local_edges` edges, ~80 MB driver heap): pull the
       pair list, C union-find.  0.17s on the sf0.1 flagship's 114k-pair
       graph.
    2. STREAMING (any edge count whose NODE set fits `max_local_nodes`,
       ~16 B/node): edges stream batch-by-batch through an incremental C
       union-find — memory is O(nodes), edges never coexist.  Union-find
       is one-pass over edges, so this is 2 linear streams (id-collect,
       then union) vs the distributed path's ~log(diameter) rounds of
       joins (measured: 24 rounds x 8.2s of join fixed-cost on the same
       114k-pair graph = 195s).  The driver NIC is the bottleneck —
       honest crossover: prefer this while total edge bytes stream in
       less time than ~25 distributed join rounds would take.
    3. DISTRIBUTED min-label propagation with pointer jumping: labels
       start as own id; each round ships labels across the (symmetrized)
       edges with Ray Data's native hash join and takes the per-node
       minimum, then label-doubling halves every chain — O(log diameter)
       rounds, each bounded by the EDGE list (~16 B/edge), never the
       corpus.  The only regime when even the node set exceeds the
       driver (beyond ~10^9 nodes at the 50M default x 20).  If
       `max_iters` rounds pass without convergence the loop stops and
       LOGS the residual (no-silent-caps rule); labels are then upper
       bounds, still a valid (finer) partition.

    All three produce identical labels (test_cc_regimes_identical).
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    def symmetrize(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("a"), np.int64)
        b = np.asarray(t.column("b"), np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    raw = pairs.select_columns(["a", "b"]).materialize()
    n_pairs = raw.count()
    if n_pairs == 0:
        # no pairs -> no components; the empty-block Dataset would lose
        # its schema before the join (observed: Arrow "no match for key
        # field src"), so return a TYPED empty result instead
        return rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                       "component": pa.array([], pa.int64())}))
    if 2 * n_pairs <= max_local_edges:
        # small-graph shortcut: every distributed round costs ~seconds of
        # hash-join actor overhead regardless of size (observed: 112k
        # edges, 396s through the join path), while path-compressed
        # union-find on the driver is O(E a(E)) — milliseconds.  16 B/edge:
        # the default 5M-edge ceiling is ~80 MB of driver heap.  Same
        # min-id-representative contract as the distributed path.  Union-
        # find treats edges as undirected, so the raw (a, b) list streams
        # straight to the driver — no symmetrize pass, no second
        # materialize (those existed only for the distributed rounds).
        t = pa.concat_tables(
            [b for b in raw.iter_batches(batch_format="pyarrow")])
        src = np.asarray(t.column("a"), np.int64)
        dst = np.asarray(t.column("b"), np.int64)
        nodes, codes = np.unique(np.concatenate([src, dst]),
                                 return_inverse=True)
        half = len(src)
        from nem_mms_ray.ops import _setops_native

        # C union-find when a compiler is present (test_cc_native_parity:
        # identical labels) — the interpreted loop below costs ~1us/edge,
        # the kernel ~50ns/edge (2.0s -> 0.14s on a 2.37M-edge graph; the
        # loop was the CC stage's dominant cost on the sf0.1 flagship)
        par = _setops_native.union_find_minroot(
            codes[:half], codes[half:], len(nodes))
        if par is not None:
            comp = nodes[par]
            return rd.from_arrow(pa.table({"id": pa.array(nodes),
                                           "component": pa.array(comp)}))
        parent = np.arange(len(nodes), dtype=np.int64)

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:       # path compression
                parent[x], x = root, parent[x]
            return root

        for a_c, b_c in zip(codes[:half].tolist(), codes[half:].tolist()):
            ra, rb = find(a_c), find(b_c)
            if ra != rb:
                # union by MIN NODE ID so the root is the representative
                if nodes[ra] <= nodes[rb]:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        comp = np.array([nodes[find(i)] for i in range(len(nodes))], np.int64)
        return rd.from_arrow(pa.table({"id": pa.array(nodes),
                                       "component": pa.array(comp)}))

    # STREAMING middle regime: node set fits the driver even though the
    # edge list does not — see the docstring's regime table
    if max_local_nodes > 0:
        from nem_mms_ray.ops._setops_native import StreamingUnionFind

        nodes = _streamed_unique_ids(raw, max_local_nodes)
        uf = (StreamingUnionFind.create(len(nodes))
              if nodes is not None else None)
        if uf is not None:
            for t in raw.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 20):
                if not t.num_rows:
                    continue
                a = np.asarray(t.column("a"), np.int64)
                b = np.asarray(t.column("b"), np.int64)
                uf.add_edges(np.searchsorted(nodes, a),
                             np.searchsorted(nodes, b))
            comp = nodes[uf.flatten()]
            return rd.from_arrow(pa.table({"id": pa.array(nodes),
                                           "component": pa.array(comp)}))
        if nodes is None:
            logger.info(
                "connected_components: node set exceeds max_local_nodes=%d "
                "— distributed label-propagation regime", max_local_nodes)

    # distributed rounds need the symmetrized edge list (labels propagate
    # along both directions of every pair)
    edges = raw.map_batches(symmetrize, batch_format="pyarrow").materialize()
    # size the join from the edge list (count is free on a materialized
    # dataset): each round's join/groupby traffic is proportional to it
    num_partitions = _join_partitions(num_partitions,
                                      edge_rows=edges.count())
    labels = (edges.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))
              .map_batches(lambda t: pa.table({
                  "id": t.column("src"),
                  "label": pa.compute.min_element_wise(t.column("src"),
                                                       t.column("nbr_min")),
              }), batch_format="pyarrow").materialize())

    for it in range(max_iters):
        # propagate: each node offers its label to every neighbor
        offered = (edges.join(labels.map_batches(
                        lambda t: t.rename_columns(["src", "label"]),
                        batch_format="pyarrow"),
                        join_type="inner", num_partitions=num_partitions,
                        on=("src",))
                   .groupby("dst").aggregate(Min("label", alias_name="offer")))
        merged = labels.join(
            offered.map_batches(lambda t: t.rename_columns(["id", "offer"]),
                                batch_format="pyarrow"),
            join_type="left_outer", num_partitions=num_partitions, on=("id",))

        def take_min(t: pa.Table) -> pa.Table:
            # all-Arrow int64: routing labels through float64 (or pandas
            # fillna, which upcasts nullable int64) would corrupt node ids
            # above 2^53 — common when ids are 64-bit hashes (ADVICE r3).
            # A node with no offer keeps its label via the int64-max
            # sentinel, never via inf.
            lab = t.column("label").combine_chunks().cast(pa.int64())
            off = pa.compute.fill_null(
                t.column("offer").combine_chunks().cast(pa.int64()),
                np.iinfo(np.int64).max)
            new = pa.compute.min_element_wise(lab, off)
            chg = pa.compute.not_equal(new, lab).cast(pa.int64())
            return pa.table({"id": t.column("id").cast(pa.int64()),
                             "label": new, "chg": chg})

        nxt = merged.map_batches(take_min, batch_format="pyarrow").materialize()
        n_changed = int(nxt.sum("chg") or 0)
        labels = nxt.select_columns(["id", "label"]).materialize()

        # pointer jumping (label doubling): label[v] <- label[label[v]].
        # Edge propagation alone moves the minimum ONE hop per round, so a
        # chain-shaped pair graph — exactly what the minhash chain-to-min
        # skew guard emits for a mega-cluster — needs O(cluster size)
        # rounds (observed: 120k-doc webtable, 25 rounds, no fixpoint).
        # Jumping halves every chain's depth per round, making the loop
        # O(log diameter): 25 rounds covers diameter 2^25.  label[label[v]]
        # is in v's component and <= label[v]'s own bound, so the invariant
        # (label = some component member's id, non-increasing) holds.
        as_parent = labels.map_batches(
            lambda t: pa.table({"label": t.column("id"),
                                "parent": t.column("label")}),
            batch_format="pyarrow")
        jumped = labels.join(as_parent, join_type="left_outer",
                             num_partitions=num_partitions, on=("label",))

        def jump_min(t: pa.Table) -> pa.Table:
            lab = t.column("label").combine_chunks().cast(pa.int64())
            par = pa.compute.fill_null(
                t.column("parent").combine_chunks().cast(pa.int64()),
                np.iinfo(np.int64).max)
            new = pa.compute.min_element_wise(lab, par)
            chg = pa.compute.not_equal(new, lab).cast(pa.int64())
            return pa.table({"id": t.column("id").cast(pa.int64()),
                             "label": new, "chg": chg})

        jnxt = jumped.map_batches(jump_min, batch_format="pyarrow").materialize()
        n_changed += int(jnxt.sum("chg") or 0)
        labels = jnxt.select_columns(["id", "label"]).materialize()
        if n_changed == 0:
            break
    else:
        logger.warning(
            "connected_components: no fixpoint after %d rounds — labels are "
            "an upper-bound (finer) partition; raise max_iters for graphs "
            "with longer chains", max_iters)
    return labels.map_batches(
        lambda t: pa.table({"id": t.column("id"),
                            "component": t.column("label")}),
        batch_format="pyarrow")
