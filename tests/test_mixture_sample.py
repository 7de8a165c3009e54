"""mixture_sample: per-group deterministic Bernoulli rates (corpus mixing).
Planted rate extremes, DuckDB CASE mirror over sf0.001, hash_sample
consistency, default-rate allowlist, null group, repartition invariance."""

import duckdb
import pyarrow as pa
import pytest

from nem_mms_ray.ops.sampling import hash_sample, mixture_sample

SF_DIR = "/root/testdata/sf0.001"


def _docs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "lang", "text"])


def test_mixture_rate_extremes_and_null_group(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "lang": pa.array(["en", "en", "fr", "fr", None, "xx"]),
                  "text": pa.array([f"doc number {i} body" for i in range(6)])})
    got = (mixture_sample(rd.from_arrow(t), {"en": 1.0, "fr": 0.0})
           .to_pandas().sort_values("doc_id"))
    # en kept in full, fr dropped, null + unlisted 'xx' -> default_rate 0.0
    assert got["doc_id"].tolist() == [0, 1]
    all_kept = mixture_sample(
        rd.from_arrow(t), {}, default_rate=1.0).to_pandas()
    assert len(all_kept) == 6


def test_mixture_matches_duckdb_case(ray_session):
    rates = {"en": 0.8, "fr": 0.25, "es": 0.0}  # de/zh -> default 0.5
    got = (mixture_sample(_docs(ray_session), rates, default_rate=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = duckdb.sql(f"""
        SELECT doc_id, lang, text
        FROM read_parquet('{SF_DIR}/documents.parquet')
        WHERE substr(md5(coalesce(text, '')), 1, 4) <
              CASE lang WHEN 'en' THEN 'cccc' WHEN 'fr' THEN '4000'
                        WHEN 'es' THEN '0000' ELSE '8000' END
        ORDER BY doc_id
    """).df()
    assert len(got) == len(want) > 50
    assert got["doc_id"].tolist() == want["doc_id"].astype(int).tolist()
    # per-group realized rates are near their targets (en ~0.8 of 193 etc.)
    n_en = (want["lang"] == "en").sum()
    assert 0.65 * 193 <= n_en <= 0.95 * 193


def test_mixture_uniform_equals_hash_sample(ray_session):
    uni = (mixture_sample(_docs(ray_session), {}, default_rate=0.3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    hs = (hash_sample(_docs(ray_session), 0.3)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert uni["doc_id"].tolist() == hs["doc_id"].tolist()


def test_mixture_repartition_invariant(ray_session):
    rates = {"en": 0.7, "fr": 0.2}
    a = (mixture_sample(_docs(ray_session), rates, default_rate=0.4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (mixture_sample(_docs(ray_session).repartition(7), rates,
                        default_rate=0.4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_mixture_rate_monotone_subset(ray_session):
    """The md5-threshold contract makes samples NESTED: every doc kept at
    a lower rate is kept at any higher rate (no resampling churn when a
    mix weight is tuned up — the operational property that matters when
    re-running a 100 TB mix with adjusted weights)."""
    docs = _docs(ray_session)
    lo = set(mixture_sample(docs, {"en": 0.2}, default_rate=0.1)
             .to_pandas()["doc_id"])
    hi = set(mixture_sample(docs, {"en": 0.6}, default_rate=0.3)
             .to_pandas()["doc_id"])
    assert lo and lo < hi
