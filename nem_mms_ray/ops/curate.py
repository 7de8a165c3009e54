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
        q = np.asarray(quality_score_batch(batch).column("quality"), np.float64)
        lp = self.langid(batch).column("lang_pred").to_pylist()
        keep = q >= self.quality_min
        if self.lang is not None:
            keep &= np.asarray(lp, dtype=object) == self.lang
        mask = pa.array(keep)
        fp = fingerprint_batch(batch).column("fp").filter(mask)
        return pa.table({
            "doc_id": batch.column("doc_id").filter(mask).cast(pa.int64()),
            "fp": fp,
            "lang_pred": pa.array(np.asarray(lp, dtype=object)[keep].tolist(),
                                  pa.string()),
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
