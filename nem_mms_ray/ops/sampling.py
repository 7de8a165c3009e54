"""Corpus sampling / capping operators for training-data pipelines.

Three operations a 100 TB curation run needs constantly, each expressed as
a shuffle-minimal Ray Data shape with an exact DuckDB mirror:

- `hash_sample`: deterministic content-hash Bernoulli sampling.  Keep a doc
  iff the md5-hex prefix of its text compares below a threshold string —
  pure map_batches, zero shuffle, reproducible across runs/clusters, and
  the mirror is a single substr() comparison.  (Random sampling is neither
  reproducible nor oracle-checkable; hash sampling is the standard trick.)
- `token_topk`: exact global top-k tokens.  Per-batch partial counts
  (np.unique, one row per distinct token per batch) -> Sum groupby ->
  sort/limit on the aggregated vocabulary.  The shuffle moves one row per
  distinct token per batch, never the corpus; the final sort is over the
  vocabulary, which is orders of magnitude smaller than the input.  At
  extreme vocab (web-scale typo space), swap the final exact sort for a
  count-min/heavy-hitter sketch — this operator is the exact variant.
- `stratified_cap`: per-group deterministic cap (first `cap` rows per
  group by an order column).  Per-batch partial cap bounds what enters
  the shuffle to cap rows per (group, batch); a final per-group pass picks
  the global first-N.  Mirrors row_number() OVER (PARTITION BY g ORDER BY o).
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa

logger = logging.getLogger(__name__)


def sample_threshold(rate: float, precision: int = 4) -> str:
    """Hex-string threshold for `hash_sample`: docs whose md5 prefix is
    lexicographically below it are kept.  Effective rate is
    floor(rate * 16^precision) / 16^precision (exactly representable;
    16^4 = 65536 steps at the default precision)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    v = int(rate * 16**precision)
    if v >= 16**precision:
        return "g"  # sorts above every hex digit: keep everything
    return format(v, f"0{precision}x")


def hash_sample(ds, rate: float, precision: int = 4,
                text_col: str = "text"):
    """Deterministic Bernoulli sample: keep rows whose md5(text) hex
    prefix < sample_threshold(rate).  No shuffle, no RNG state — the same
    corpus always yields the same sample, on any cluster size."""
    thr = sample_threshold(rate, precision)

    def keep(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        mask = np.fromiter(
            (hashlib.md5((t or "").encode()).hexdigest()[:precision] < thr
             for t in texts),
            dtype=bool, count=len(texts))
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def token_topk(ds, k: int = 20, text_col: str = "text"):
    """Exact global top-k tokens by count: Dataset[(token, n)] with
    deterministic tie order (count desc, token asc).  Tokens are the
    lowercased whitespace split of the full text."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        flat = [w for t in texts for w in (t or "").lower().split()]
        if not flat:
            return pa.table({"token": pa.array([], pa.string()),
                             "n_p": pa.array([], pa.int64())})
        uniq, counts = np.unique(np.asarray(flat, dtype=object),
                                 return_counts=True)
        return pa.table({"token": pa.array(uniq.tolist(), pa.string()),
                         "n_p": pa.array(counts.astype(np.int64))})

    agg = (ds.map_batches(partial_counts, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n_p", alias_name="n")))
    return (agg.sort(["n", "token"], descending=[True, False])
               .limit(k))


def stratified_cap(ds, cap: int, group_col: str = "lang",
                   order_col: str = "doc_id", columns: tuple = ()):
    """First `cap` rows per group ordered by `order_col` — the per-language
    (or per-source/domain) quota a balanced training mix applies.

    Scale shape: a per-batch combiner keeps at most `cap` rows per group
    per batch, so the shuffle carries <= cap x n_batches rows per group
    regardless of corpus size; the per-group final pass then takes the
    global first `cap`.  Group count = distinct group values (languages,
    sources — small), so groupby group_col directly is fine; the combiner,
    not bucketing, is what bounds the hot-group concentration.
    """
    keep_cols = [group_col, order_col, *columns]

    def partial_cap(t: pa.Table) -> pa.Table:
        df = t.select(keep_cols).to_pandas()
        # dropna=False: a null group value is a group like any other (the
        # final Ray groupby also keeps null keys) — the pandas default
        # would silently drop those rows here
        w = (df.sort_values([group_col, order_col])
               .groupby(group_col, sort=False, dropna=False).head(cap))
        return pa.Table.from_pandas(w, preserve_index=False)

    def final_cap(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(order_col).head(cap))[keep_cols]

    return (ds.map_batches(partial_cap, batch_format="pyarrow")
              .groupby(group_col)
              .map_groups(final_cap, batch_format="pandas"))
