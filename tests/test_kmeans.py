"""Distributed spherical k-means (`ops/ann.py::train_kmeans`): naive-mirror
parity, objective monotonicity, determinism across partitionings, empty
clusters, and the IVF refine hook.  Iterative training has no SQL
expression — the from-scratch numpy mirror is the oracle (the driver's
ivf/cluster queries stay on the fixed-centroid regime)."""
import numpy as np
import pyarrow as pa
import pytest


def _blobs(n_per: int = 60, k: int = 4, dim: int = 8, seed: int = 3):
    """Well-separated unit blobs: k orthogonal-ish anchors + small noise."""
    rng = np.random.default_rng(seed)
    anchors = np.eye(dim)[:k] * 5.0
    pts = np.concatenate([a + rng.normal(0, 0.15, (n_per, dim))
                          for a in anchors])
    return pts


def _naive_spherical(m: np.ndarray, c0: np.ndarray, n_iters: int):
    """From-scratch single-process mirror of the distributed trainer:
    cosine assign (ties -> lowest id), normalized-mean update, empty
    clusters keep their centroid."""
    norm = lambda x: x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                                    1e-300)
    m = norm(m)
    c = c0.copy()
    for _ in range(n_iters):
        a = (m @ c.T).argmax(axis=1)
        new_c = c.copy()
        for j in range(len(c)):
            s = m[a == j].sum(axis=0)
            if np.linalg.norm(s) > 0:
                new_c[j] = s / np.linalg.norm(s)
        c = new_c
    return c, (m @ c.T).argmax(axis=1)


def _to_ds(m: np.ndarray, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in m],
                              pa.list_(pa.float32())),
    }))
    return ds.repartition(blocks) if blocks > 1 else ds


def test_train_kmeans_matches_naive_mirror(ray_session):
    """Same seeded init, same iteration count: assignments identical to
    the from-scratch mirror, centroids allclose (partial-sum grouping
    differs by batch boundaries, so only reduction-rounding drift)."""
    from nem_mms_ray.ops.ann import (_normalize, assign_clusters,
                                     build_ivf_centroids, train_kmeans)

    m = _blobs()
    ds = _to_ds(m, blocks=5)
    init = build_ivf_centroids(ds, 4, seed=42)
    got_c, hist = train_kmeans(ds, 4, n_iters=5, init=init)
    # float32 storage quantizes before normalize — mirror through the
    # same dtype the dataset holds
    want_c, want_a = _naive_spherical(
        m.astype(np.float32).astype(np.float64), init, n_iters=5)
    assert np.allclose(got_c, want_c, atol=1e-9)
    got_a = (assign_clusters(ds, got_c).to_pandas()
             .sort_values("vec_id")["cluster"].to_numpy())
    assert (got_a == want_a).all()
    assert len(hist) <= 5 and hist[0]["n_assigned_clusters"] >= 1
    # well-separated blobs: each of the 4 clusters ends up pure
    labels = np.repeat(np.arange(4), 60)
    for j in np.unique(got_a):
        assert len(np.unique(labels[got_a == j])) == 1


def test_train_kmeans_objective_monotone_and_converges(ray_session):
    """The spherical objective (sum of assigned cosines) never decreases
    across iterations, and the run stops early once centroids settle."""
    from nem_mms_ray.ops.ann import train_kmeans

    ds = _to_ds(_blobs(seed=11), blocks=3)
    c, hist = train_kmeans(ds, 4, n_iters=25, tol=1e-9)
    objs = [h["objective"] for h in hist]
    assert all(b >= a - 1e-9 for a, b in zip(objs, objs[1:]))
    assert len(hist) < 25                      # converged early
    assert hist[-1]["max_shift"] < 1e-9
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0)


def test_train_kmeans_partition_invariance(ray_session):
    """1-block and 7-block runs assign identically; centroids agree to
    reduction-rounding scale."""
    from nem_mms_ray.ops.ann import assign_clusters, train_kmeans

    m = _blobs(seed=29)
    c1, _ = train_kmeans(_to_ds(m, 1), 4, n_iters=4)
    c7, _ = train_kmeans(_to_ds(m, 7), 4, n_iters=4)
    assert np.allclose(c1, c7, atol=1e-9)
    a1 = (assign_clusters(_to_ds(m, 1), c1).to_pandas()
          .sort_values("vec_id")["cluster"].tolist())
    a7 = (assign_clusters(_to_ds(m, 7), c7).to_pandas()
          .sort_values("vec_id")["cluster"].tolist())
    assert a1 == a7


def test_train_kmeans_empty_cluster_keeps_centroid(ray_session):
    """An init centroid no vector picks keeps its position instead of
    collapsing to NaN (k > distinct directions)."""
    from nem_mms_ray.ops.ann import train_kmeans

    m = np.concatenate([np.tile([1.0, 0, 0, 0], (30, 1)),
                        np.tile([0, 1.0, 0, 0], (30, 1))])
    init = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0],
                     [0, 0, 1.0, 0]])  # third centroid attracts nothing
    c, hist = train_kmeans(_to_ds(m), 3, n_iters=3, init=init)
    assert np.isfinite(c).all()
    assert np.allclose(c[2], [0, 0, 1.0, 0])
    assert hist[-1]["n_assigned_clusters"] == 2


def test_build_ivf_index_refine_improves_objective(ray_session, tmp_path):
    """refine_iters trains on the full corpus: the refined index's
    centroids score an equal-or-better cosine objective than the sampled
    ones, and the persisted index stays queryable."""
    import pyarrow.parquet as pq

    from nem_mms_ray.ops.ann import (build_ivf_centroids, build_ivf_index,
                                     ivf_index_topk, train_kmeans)

    m = _blobs(n_per=80, seed=5)
    ds = _to_ds(m, blocks=4)

    def objective(c):
        mm = m / np.linalg.norm(m, axis=1, keepdims=True)
        return float((mm @ c.T).max(axis=1).sum())

    sampled = build_ivf_centroids(ds, 4, sample_rows=32, seed=1)
    refined, _ = train_kmeans(ds, 4, n_iters=5, init=sampled)
    assert objective(refined) >= objective(sampled) - 1e-9

    build_ivf_index(ds, tmp_path / "ivf", n_centroids=4, refine_iters=3)
    got = ivf_index_topk(tmp_path / "ivf", m[:2], k=3, nprobe=4)
    assert len(got) == 6  # 2 queries x top-3, exhaustive probe
    cents = pq.read_table(str(tmp_path / "ivf" / "centroids.parquet"))
    assert cents.num_rows == 4
