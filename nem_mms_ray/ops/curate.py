"""Composed training-data curation: quality/language gate + exact dedup.

The flagship composition a 100 TB pre-training pipeline runs end-to-end
(filter -> dedup -> keep representative), expressed Ray-Data-first:

- ONE fused read pass labels every doc (quality score, language id, md5
  fingerprint) and filters immediately — rejected docs never leave the
  stage, and the text column never enters the shuffle;
- the dedup shuffle moves only (doc_id, fp, lang_pred, quality) rows
  (~50 B/doc), coarse-bucketed by fingerprint hash so the Ray group count
  stays flat at any corpus size;
- the winner per fingerprint is the minimum doc_id (deterministic), with
  its labels — SQL-mirrorable, so the whole composition is oracle-checked.

Callers that need the curated text back semi-join the winner ids against
the source (broadcast under a threshold, or the `pairs_payload_metric`
bucket join for huge survivor sets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from nem_mms_ray.ops.textstats import LangId, fingerprint_batch, quality_score_batch


class CurateLabel:
    """Actor-pool stage: doc -> (doc_id, fp, lang_pred, quality), filtered.

    Stateful pattern: the LangId stopword tables and word regex build once
    per actor; each batch runs the three vectorized labelers and applies
    the quality/language gate before anything is emitted.
    """

    def __init__(self, quality_min: float = 0.0, lang: str | None = None,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.langid = LangId()
        self.quality_min = quality_min
        self.lang = lang
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.id_col != "doc_id" or self.text_col != "text":
            batch = batch.rename_columns(
                ["doc_id" if c == self.id_col else
                 "text" if c == self.text_col else c
                 for c in batch.column_names])
        import pyarrow.compute as pc

        q = np.asarray(quality_score_batch(batch).column("quality"), np.float64)
        lp = self.langid(batch).column("lang_pred")
        keep = q >= self.quality_min
        if self.lang is not None:
            keep &= np.asarray(pc.equal(lp, self.lang))
        mask = pa.array(keep)
        fp = fingerprint_batch(batch).column("fp").filter(mask)
        return pa.table({
            "doc_id": batch.column("doc_id").filter(mask).cast(pa.int64()),
            "fp": fp,
            "lang_pred": lp.filter(mask),
            "quality": pa.array(q[keep], pa.float64()),
        })


_WORKER_LABELERS: dict = {}


def _label_task(batch: pa.Table, **kw) -> pa.Table:
    """Task-mode wrapper: warm Ray workers cache the CurateLabel stage
    (stopword tables, compiled regex) across tasks like an actor would,
    without the actor-pool ramp-up (~3s on this sandbox)."""
    key = tuple(sorted(kw.items()))
    st = _WORKER_LABELERS.get(key)
    if st is None:
        st = _WORKER_LABELERS[key] = CurateLabel(**kw)
    return st(batch)


def curate_documents(ds, quality_min: float = 0.0, lang: str | None = None,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = 64, concurrency: int | None = None):
    """Dataset[(doc_id, lang_pred, quality)] of curated survivors:
    quality >= quality_min, (optional) lang_pred == lang, exact-dedup
    winner (min doc_id) per md5 fingerprint.

    `concurrency` switches the label stage to an explicit actor pool; the
    default task mode caches the stage in warm workers (same state reuse,
    no pool ramp-up)."""
    import functools

    if concurrency:
        labeled = ds.map_batches(
            CurateLabel,
            fn_constructor_kwargs={"quality_min": quality_min, "lang": lang,
                                   "id_col": id_col, "text_col": text_col},
            batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
    else:
        labeled = ds.map_batches(
            functools.partial(_label_task, quality_min=quality_min, lang=lang,
                              id_col=id_col, text_col=text_col),
            batch_format="pyarrow",
            num_cpus=1,
        )

    def partial_winners(t: pa.Table) -> pa.Table:
        # combiner: per-batch winner per fingerprint BEFORE the shuffle —
        # a mega-duplicate fp (e.g. a boilerplate page repeated across the
        # corpus) then contributes at most one row per batch to its bucket
        # instead of concentrating every occurrence in one task
        df = t.to_pandas()
        w = df.loc[df.groupby("fp")["doc_id"].idxmin()]
        return pa.Table.from_pandas(w, preserve_index=False)

    def add_bucket(t: pa.Table) -> pa.Table:
        # first 15 hex chars of the md5 -> int; uniform by construction
        fp = t.column("fp").to_pylist()
        h = np.array([int(x[:15], 16) for x in fp], np.int64)
        return t.append_column("bucket",
                               pa.array((h % n_buckets).astype(np.int32)))

    def pick_winners(g: pd.DataFrame) -> pd.DataFrame:
        w = g.loc[g.groupby("fp")["doc_id"].idxmin()]
        return pd.DataFrame({
            "doc_id": w["doc_id"].to_numpy(np.int64),
            "lang_pred": w["lang_pred"],
            "quality": w["quality"].to_numpy(np.float64),
        })

    return (
        labeled.map_batches(partial_winners, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pick_winners, batch_format="pandas")
    )


def curated_text_semijoin(source_ds, winners_ds, id_col: str = "doc_id",
                          text_col: str = "text",
                          max_broadcast_ids: int = 5_000_000,
                          n_buckets: int = 64):
    """Semi-join the curation winners back against the source corpus —
    the "last mile" that turns the ~50 B/doc winner labels into usable
    curated DATA (reference analog: the pipeline ends in written tables,
    src/packages/mod.rs:219-235, not summaries).

    Returns Dataset[(doc_id, text, lang_pred, quality)].

    Two shapes, auto-selected on the winner count:
    - broadcast (winners <= max_broadcast_ids): the label rows — ids +
      two small columns, no text — ship once via ray.put; one map_batches
      over the source filters and attaches labels.  Zero shuffles; the
      text of survivors streams straight through.
    - distributed (huge survivor sets): hash-bucket join — both sides
      gain bucket = id % n_buckets, a single union+groupby co-locates
      each id's label row with its source row, and the merge is a
      vectorized pandas join per bucket.  Source text crosses the shuffle
      exactly once (there is no way to pre-filter without knowing the
      winner set), so exchange volume is O(corpus bytes) — callers whose
      winner set fits memory should prefer raising max_broadcast_ids
      (label rows are ~50 B: 5M winners ~ 250 MB driver/worker heap).
    """
    import ray

    n_winners = winners_ds.count()
    if n_winners <= max_broadcast_ids:
        wdf = winners_ds.to_pandas()
        lref = ray.put((
            wdf[id_col].to_numpy(np.int64),
            wdf["lang_pred"].to_numpy(object),
            wdf["quality"].to_numpy(np.float64),
        ))

        def attach(batch: pa.Table) -> pa.Table:
            ids_w, lang_w, q_w = ray.get(lref)
            order = np.argsort(ids_w)
            sk = ids_w[order]
            ids = np.asarray(batch.column(id_col), np.int64)
            pos = np.searchsorted(sk, ids)
            pos = np.clip(pos, 0, max(len(sk) - 1, 0))
            hit = (sk[pos] == ids) if len(sk) else np.zeros(len(ids), bool)
            mask = pa.array(hit)
            widx = order[pos[hit]]
            return pa.table({
                id_col: batch.column(id_col).filter(mask).cast(pa.int64()),
                text_col: batch.column(text_col).filter(mask),
                "lang_pred": pa.array(lang_w[widx].tolist(), pa.string()),
                "quality": pa.array(q_w[widx], pa.float64()),
            })

        return source_ds.map_batches(attach, batch_format="pyarrow")

    # distributed hash-bucket join (winner set too large to broadcast)
    def tag_source(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), np.int64)
        return pa.table({
            id_col: pa.array(ids),
            text_col: t.column(text_col),
            "lang_pred": pa.nulls(len(ids), pa.string()),
            "quality": pa.nulls(len(ids), pa.float64()),
            "side": pa.array(np.ones(len(ids), np.int8)),
            "bucket": pa.array((ids % n_buckets).astype(np.int32)),
        })

    def tag_winners(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), np.int64)
        return pa.table({
            id_col: pa.array(ids),
            text_col: pa.nulls(len(ids), pa.string()),
            "lang_pred": t.column("lang_pred"),
            "quality": t.column("quality"),
            "side": pa.array(np.zeros(len(ids), np.int8)),
            "bucket": pa.array((ids % n_buckets).astype(np.int32)),
        })

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["side"] == 0]
        src = g[g["side"] == 1]
        keep = src[src[id_col].isin(lab[id_col])]
        m = keep[[id_col, text_col]].merge(
            lab[[id_col, "lang_pred", "quality"]], on=id_col, how="inner")
        return m[[id_col, text_col, "lang_pred", "quality"]]

    both = source_ds.map_batches(tag_source, batch_format="pyarrow").union(
        winners_ds.map_batches(tag_winners, batch_format="pyarrow"))
    return (both.groupby("bucket")
                .map_groups(merge_bucket, batch_format="pandas"))


def _id_join(ds, ids_ds, keep: bool, id_col: str,
             max_broadcast_ids: int, n_buckets: int):
    """Shared body of `drop_ids` (keep=False) and `keep_ids` (keep=True):
    filter `ds` by membership of `id_col` in `ids_ds`'s `id` column.

    Two auto-selected shapes: the id side is bare int64s (8 B each — 5M
    ids ~ 40 MB), so broadcast + per-batch searchsorted covers any
    realistic set; above the threshold a hash-bucket union (anti-)join
    keeps everything worker-side (payload rows cross the shuffle once —
    unavoidable without knowing the set)."""
    import ray

    n_ids = ids_ds.count()
    if n_ids == 0:
        return ds.map_batches(lambda t: t.slice(0, 0),
                              batch_format="pyarrow") if keep else ds
    if n_ids <= max_broadcast_ids:
        sk = np.sort(ids_ds.to_pandas()["id"].to_numpy(np.int64))
        ref = ray.put(sk)

        def member_filter(batch: pa.Table) -> pa.Table:
            s = ray.get(ref)
            ids = np.asarray(batch.column(id_col), np.int64)
            pos = np.clip(np.searchsorted(s, ids), 0, len(s) - 1)
            hit = s[pos] == ids
            return batch.filter(pa.array(hit if keep else ~hit))

        return ds.map_batches(member_filter, batch_format="pyarrow")

    def tag_payload(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), np.int64)
        return (t.append_column("side", pa.array(np.ones(len(ids), np.int8)))
                 .append_column("bucket",
                                pa.array((ids % n_buckets).astype(np.int32))))

    def tag_ids(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("id"), np.int64)
        return pa.table({id_col: pa.array(ids),
                         "side": pa.array(np.zeros(len(ids), np.int8)),
                         "bucket": pa.array(
                             (ids % n_buckets).astype(np.int32))})

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        named = g.loc[g["side"] == 0, id_col]
        member = g[id_col].isin(named)
        out = g[(g["side"] == 1) & (member if keep else ~member)]
        return out.drop(columns=["side", "bucket"])

    both = ds.map_batches(tag_payload, batch_format="pyarrow").union(
        ids_ds.map_batches(tag_ids, batch_format="pyarrow"))
    return both.groupby("bucket").map_groups(filter_bucket,
                                             batch_format="pandas")


def drop_ids(ds, drop_ds, id_col: str = "doc_id",
             max_broadcast_ids: int = 5_000_000, n_buckets: int = 64):
    """Anti-join: rows of `ds` whose `id_col` does NOT appear in `drop_ds`
    (a Dataset with an `id` column).  All other columns pass through.
    Shapes: see `_id_join`."""
    return _id_join(ds, drop_ds, keep=False, id_col=id_col,
                    max_broadcast_ids=max_broadcast_ids, n_buckets=n_buckets)


def keep_ids(ds, keep_ds, id_col: str = "doc_id",
             max_broadcast_ids: int = 5_000_000, n_buckets: int = 64):
    """Semi-join: rows of `ds` whose `id_col` DOES appear in `keep_ds`
    (a Dataset with an `id` column).  All other columns pass through —
    the generic twin of `drop_ids`, used by the web pipeline's
    per-domain cap (the winner set filters the corpus before curation).
    Shapes: see `_id_join`; an empty keep set yields an empty result."""
    return _id_join(ds, keep_ds, keep=True, id_col=id_col,
                    max_broadcast_ids=max_broadcast_ids, n_buckets=n_buckets)


def curate_documents_near(ds_factory, quality_min: float = 0.0,
                          lang: str | None = None, threshold: float = 1.0,
                          id_col: str = "doc_id", text_col: str = "text",
                          minhash_kw: dict | None = None, text_map=None,
                          **semijoin_kw):
    """The full curation endgame (VERDICT r3 item 8): gate + exact dedup +
    text semi-join, then MinHash near-dup pairs -> connected components ->
    keep only each component's representative (its minimum id).

    Returns Dataset[(doc_id, text, lang_pred, quality)] — the curated
    corpus with near-duplicates collapsed.

    The curated intermediate is materialized once: it is consumed three
    times (minhash signature pass, minhash verify pass, final anti-join)
    and is the natural checkpoint of a production run (which would
    `write_parquet` it instead — post-gate + exact-dedup, so a fraction
    of the corpus; Ray's object store spills it rather than re-running
    three corpus reads + label passes).  Docs that appear in no near-dup
    pair are their own representative and pass through untouched.
    """
    from nem_mms_ray.ops.dedup import connected_components, minhash_dedup

    curated = curate_documents_with_text(
        ds_factory, quality_min=quality_min, lang=lang, id_col=id_col,
        text_col=text_col, text_map=text_map, **semijoin_kw).materialize()
    near_in = curated.select_columns([id_col, text_col])
    if (id_col, text_col) != ("doc_id", "text"):
        near_in = near_in.map_batches(
            lambda t: t.rename_columns(["doc_id", "text"]),
            batch_format="pyarrow")
    pairs = minhash_dedup(near_in, threshold=threshold, **(minhash_kw or {}))
    comps = connected_components(pairs)
    losers = comps.map_batches(
        lambda t: pa.table({"id": t.column("id").filter(
            pa.compute.not_equal(t.column("id"), t.column("component")))}),
        batch_format="pyarrow")
    return drop_ids(curated, losers, id_col=id_col)


def curate_documents_with_text(ds_factory, quality_min: float = 0.0,
                               lang: str | None = None,
                               id_col: str = "doc_id", text_col: str = "text",
                               text_map=None, **semijoin_kw):
    """curate_documents + curated_text_semijoin in one call.

    `ds_factory` is a zero-arg callable returning a fresh source Dataset —
    the corpus is read TWICE (label+dedup pass, then the semi-join pass);
    passing a factory instead of a Dataset makes the double read explicit
    and lets the second pass prune to (id, text) columns at the read.

    `text_map` (optional, Dataset -> Dataset): a PER-ROW-DETERMINISTIC
    transform of `text_col` only (e.g. `ops/scrub.scrub_text`).  It is
    applied to the full corpus in the label pass — so the quality gate,
    fingerprints and dedup all see the transformed text — but in the
    semi-join pass only to the WINNERS (after the filter), which is
    output-identical (map∘filter == filter∘map for a per-row transform)
    and skips transforming losers a second time."""
    gate_src = (lambda: text_map(ds_factory())) if text_map else ds_factory
    winners = curate_documents(gate_src(), quality_min=quality_min,
                               lang=lang, id_col=id_col, text_col=text_col)
    out = curated_text_semijoin(ds_factory(), winners, id_col=id_col,
                                text_col=text_col, **semijoin_kw)
    return text_map(out) if text_map else out
