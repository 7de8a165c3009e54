"""SemDeDup: semantic deduplication via within-cluster embedding cosine.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication") prune web corpora by embedding every
document, k-means clustering the embeddings, and comparing pairs ONLY
within each cluster — the trick that turns O(n^2) all-pairs cosine into
O(n^2 / k) while catching the near-duplicates that matter (semantically
identical pages whose text differs enough to defeat MinHash).

This module is the composition layer over pieces the repo already has:
`ops/ann.train_kmeans` (distributed Lloyd iterations) or any
deterministic centroid choice supplies the clusters; `semdedup` then

1. ASSIGNS each vector to its nearest centroid by cosine (centroids
   broadcast once via `ray.put`, one matmul+argmax per batch — the
   `ops/ann.assign_clusters` shape, but carrying the vector through so
   stage 2 needs no second corpus read), and
2. PRUNES within each cluster: `groupby(cluster).map_groups` sorts the
   group by id and drops every row that has cosine >= `threshold` with
   ANY smaller-id row of the same cluster.  The survivor set is exactly
   SQL's `NOT EXISTS (smaller id in my cluster with sim >= t)` — the
   DuckDB oracle mirror — and the kept row per duplicate group is the
   minimum id, the repo's representative convention (`ops/dedup.
   connected_components`).  (The paper keeps the example FARTHEST from
   the centroid per group; min-id is deterministic and
   oracle-expressible — swap the keep rule if fidelity to the paper
   matters more than SQL-checkability.)

Scale shape: the only shuffle is the `groupby(cluster)` exchange of
(id, cluster, vector) rows — O(n * dim) once, no pair explosion.
Within a cluster of m rows the pairwise pass runs BLOCKWISE (matmul of
`block` rows against the id-prefix), so peak memory is O(block * m)
floats, never m^2.  Cost is sum over clusters of m^2/2 dot products:
k must grow with n (the paper uses k ~ sqrt(n); 50k clusters for
LAION-440M) to keep clusters bounded — a cluster exceeding
`warn_cluster_rows` logs a no-silent-caps warning naming the cluster
and its size, the signal to retrain with larger k.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from nem_mms_ray.ops.ann import _normalize, _to_matrix

logger = logging.getLogger(__name__)


def semdedup(ds, centroids: np.ndarray, threshold: float = 0.95,
             id_col: str = "vec_id", vec_col: str = "embedding",
             block: int = 4096, warn_cluster_rows: int = 250_000):
    """Dataset[(id_col, cluster)] of the rows that SURVIVE semantic
    dedup: nearest-centroid assignment, then within-cluster pruning of
    any row with cosine >= `threshold` to a smaller-id row.

    `centroids`: (k, dim) array — from `ops/ann.train_kmeans`, a
    deterministic sample, or any upstream model.  All cosine math runs
    in float64 regardless of the stored embedding width.
    """
    import ray

    c = _normalize(np.atleast_2d(np.asarray(centroids, np.float64)))
    cref = ray.put(c)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        li = (m @ cc.T).argmax(axis=1).astype(np.int64)
        return pa.table({id_col: batch.column(id_col).cast(pa.int64()),
                         "cluster": pa.array(li),
                         vec_col: batch.column(vec_col)})

    def prune(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column(id_col), np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        x = _normalize(_to_matrix(g.column(vec_col))[order])
        m = len(ids)
        if m > warn_cluster_rows:
            logger.warning(
                "semdedup: cluster %d holds %d rows (> %d) — the within-"
                "cluster pass is O(m^2); retrain with more clusters",
                int(g.column("cluster")[0].as_py()), m, warn_cluster_rows)
        keep = np.ones(m, bool)
        for s in range(0, m, block):
            e = min(s + block, m)
            sims = x[s:e] @ x[:e].T
            # row r (global s+r) may only be killed by columns j < s+r
            tri = np.tri(e - s, e, k=s - 1, dtype=bool)
            keep[s:e] = ~(((sims >= threshold) & tri).any(axis=1))
        cl = np.full(int(keep.sum()), int(g.column("cluster")[0].as_py()),
                     np.int64)
        return pa.table({id_col: pa.array(ids[keep]),
                         "cluster": pa.array(cl)})

    return (ds.map_batches(assign, batch_format="pyarrow")
              .groupby("cluster")
              .map_groups(prune, batch_format="pyarrow"))
