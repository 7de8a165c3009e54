"""Char n-gram LM (perplexity filter): DuckDB mirror of train+score over
the same parquet, smoothing/held-out edges, partition invariance, and the
filtering-signal sanity check.  Held OUT of the driver's queries() (50-row
report cap); the mirror here is the same side-by-side comparison."""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nem_mms_ray.ops.charlm import (
    CharLM,
    lm_bits_scalar,
    lm_score,
    train_char_lm,
)

SF_DIR = "/root/testdata/sf0.001"
DOCS = f"{SF_DIR}/documents.parquet"


def test_train_and_score_match_duckdb(ray_session):
    """Train on sf0.001 docs and score the SAME corpus; per-doc lm_bits
    must equal the literal-string SQL: n-gram/ctx counts at n-gram start
    positions, V = distinct chars, add-alpha bits averaged per doc.
    Hash-vs-string equality is the no-collision witness."""
    import ray.data as rd

    n, a = 3, 0.1
    model = train_char_lm(rd.read_parquet(DOCS), n=n, alpha=a)
    got = (lm_score(rd.read_parquet(DOCS), model)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    sql = f"""
    WITH pos AS (
      SELECT doc_id, substr(text, i, {n}) AS g, substr(text, i, {n - 1}) AS c
      FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - {n} + 1)) AS i
            FROM read_parquet('{DOCS}'))
    ), ngc AS (SELECT g, count(*) AS cn FROM pos GROUP BY g
    ), ctxc AS (SELECT c, count(*) AS cc FROM pos GROUP BY c
    ), vv AS (
      SELECT count(DISTINCT substr(text, j, 1)) AS v
      FROM (SELECT text, unnest(generate_series(1, length(text))) AS j
            FROM read_parquet('{DOCS}'))
    )
    SELECT p.doc_id,
           avg(-log2((cn + {a}) / (cc + {a} * vv.v))) AS lm_bits
    FROM pos p JOIN ngc ON p.g = ngc.g JOIN ctxc ON p.c = ctxc.c
    CROSS JOIN vv
    GROUP BY p.doc_id ORDER BY p.doc_id
    """
    con = duckdb.connect()
    want = con.sql(sql).df()

    gd = got.dropna(subset=["lm_bits"])
    assert len(gd) == len(want) and len(want) > 400
    assert gd["doc_id"].tolist() == want["doc_id"].astype(int).tolist()
    # got is rounded to 6; SQL sums in its own order — compare at the
    # rounding quantum plus float-sum slack
    assert np.allclose(gd["lm_bits"], want["lm_bits"], atol=6e-7)


def test_smoothing_and_short_doc_edges(ray_session):
    """Unseen n-grams get the alpha floor (held-out scoring never hits
    log(0)); docs shorter than n score null; the batch scorer equals the
    scalar mirror on both."""
    import ray.data as rd

    train = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["abcabcabc", "abcd abcd"])})
    model = train_char_lm(rd.from_arrow(train), n=3, alpha=0.5)

    probe = ["abcabc", "zzzzqq", "ab", "", None]
    score = (lm_score(rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(probe, pa.string())})), model)
        .to_pandas().sort_values("doc_id"))
    vals = score["lm_bits"].tolist()
    for i, txt in enumerate(probe):
        want = lm_bits_scalar(model, txt)
        if want is None:
            assert vals[i] is None or np.isnan(vals[i])
        else:
            assert vals[i] == pytest.approx(want, abs=1e-9)
    # in-distribution scores fewer bits than out-of-distribution
    assert vals[0] < vals[1]
    assert np.isfinite(vals[1])  # smoothing: no inf on fully-unseen text


def test_train_partition_invariance(ray_session):
    """Identical model (keys, counts, V) from 1 and 7 input blocks —
    integer count sums are task-order-invariant by construction."""
    import ray.data as rd

    m1 = train_char_lm(rd.read_parquet(DOCS).repartition(1), n=3)
    m7 = train_char_lm(rd.read_parquet(DOCS).repartition(7), n=3)
    assert m1.v == m7.v
    assert np.array_equal(m1.ng_keys, m7.ng_keys)
    assert np.array_equal(m1.ng_cnts, m7.ng_cnts)
    assert np.array_equal(m1.ctx_keys, m7.ctx_keys)
    assert np.array_equal(m1.ctx_cnts, m7.ctx_cnts)


def test_min_count_prunes_model_not_denominator(ray_session):
    """min_count shrinks ng types; ctx counts stay exact so pruned mass
    falls through to smoothing (scores rise, never error)."""
    import ray.data as rd

    full = train_char_lm(rd.read_parquet(DOCS), n=3, min_count=1)
    floor = int(full.ng_cnts.min()) + 1  # guarantees >=1 type pruned
    pruned = train_char_lm(rd.read_parquet(DOCS), n=3, min_count=floor)
    assert pruned.n_types < full.n_types
    assert np.array_equal(pruned.ctx_keys, full.ctx_keys)
    txt = pq.read_table(DOCS).column("text").to_pylist()[0]
    assert lm_bits_scalar(pruned, txt) >= lm_bits_scalar(full, txt)


def test_quality_signal_orders_gibberish_last(ray_session):
    """The filtering use: corpus-trained LM scores corpus-like text lower
    (more probable) than character gibberish — the CCNet threshold works."""
    import ray.data as rd

    model = train_char_lm(rd.read_parquet(DOCS), n=3)
    texts = pq.read_table(DOCS).column("text").to_pylist()
    rng = np.random.default_rng(3)
    gibberish = "".join(rng.choice(list("qxzjvkw@#%&")) for _ in range(200))
    corpusish = texts[5]
    assert lm_bits_scalar(model, corpusish) < lm_bits_scalar(model, gibberish)


def test_guards():
    import ray.data as rd

    with pytest.raises(ValueError):
        train_char_lm(None, n=1)
    with pytest.raises(ValueError):
        train_char_lm(None, alpha=0.0)
    with pytest.raises(ValueError):
        train_char_lm(rd.from_arrow(pa.table({"text": ["abcdef ghij"]})),
                      n=3, max_types=1)


def test_batch_hashes_parity():
    """The whole-batch flat path (_batch_hashes) is bit-identical to the
    per-doc reference (_doc_hashes) on fuzzed unicode incl. astral chars,
    None, empty, and shorter-than-n docs."""
    from nem_mms_ray.ops.charlm import _batch_hashes, _doc_hashes

    rng = np.random.default_rng(9)
    alphabet = list("abc def é中\U0001F600")
    texts = ["".join(rng.choice(alphabet, rng.integers(0, 40)))
             for _ in range(150)] + [None, "", "ab", "abc"]
    for n in (2, 3, 5):
        ng, ctx, doc_idx, nh = _batch_hashes(texts, n)
        rng_list, rctx_list, rnh = [], [], []
        for t in texts:
            a, b = _doc_hashes(t, n)
            rng_list.append(a)
            rctx_list.append(b)
            rnh.append(len(a))
        assert nh.tolist() == rnh, n
        assert np.array_equal(ng, np.concatenate(rng_list)), n
        assert np.array_equal(ctx, np.concatenate(rctx_list)), n
        assert doc_idx.tolist() == [i for i, c in enumerate(rnh)
                                    for _ in range(c)], n
