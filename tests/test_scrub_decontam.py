"""PII scrubbing + benchmark decontamination."""
import re

import numpy as np
import pyarrow as pa
import pytest

from nem_mms_ray.ops.decontam import benchmark_gram_union, decontaminate
from nem_mms_ray.ops.dedup import _batch_word_ngrams
from nem_mms_ray.ops.scrub import (DEFAULT_PATTERNS, scrub_batch, scrub_stats,
                                   scrub_text)


def _py_mirror(s):
    """Sequential re.sub chain — the documented left-to-right ASCII
    semantics the Arrow RE2 chain must reproduce."""
    if s is None:
        s = ""
    for _, pat, repl in DEFAULT_PATTERNS:
        s = re.sub(pat, repl, s, flags=re.ASCII)
    return s


PLANTED = [
    ("contact bob.smith+x@example.co.uk now",
     "contact <EMAIL> now"),
    ("server at 192.168.1.254 port 80", "server at <IP> port 80"),
    ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
    ("call (555) 123-4567 today", "call <PHONE> today"),
    ("call +1 555 123 4567 today", "call <PHONE> today"),
    ("plain 555-123-4567 works", "plain <PHONE> works"),
    ("card 4111111111111111 on file", "card <NUMBER> on file"),
    # non-matches stay intact
    ("version 1.2.3 and date 12-34-5678", "version 1.2.3 and date 12-34-5678"),
    ("17 digits 12345678901234567 safe", "17 digits 12345678901234567 safe"),
    ("inside 99999-123-4567 digit run", "inside 99999-123-4567 digit run"),
]


def test_scrub_planted_examples():
    t = pa.table({"text": pa.array([s for s, _ in PLANTED])})
    got = scrub_batch(t).column("text").to_pylist()
    assert got == [w for _, w in PLANTED]


def test_scrub_matches_python_re_chain_fuzz():
    rng = np.random.default_rng(11)
    frags = ["hello", "x@y.io", "10.0.0.1", "123-45-6789", "(555) 123-4567",
             "4111111111111111", "+1 555 123 4567", "1.2", "a@b", "42",
             "999.999.999.999", "word-123", "-", ".", "@", "(", ")"]
    texts = [" ".join(rng.choice(frags, rng.integers(0, 12)))
             for _ in range(300)] + [None, ""]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = scrub_batch(t).column("text").to_pylist()
    assert got == [_py_mirror(s) for s in texts]


def test_scrub_counts_and_schema():
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a@b.co and c@d.io", "10.0.0.1"])})
    out = scrub_batch(t, with_counts=True)
    assert out.column_names == ["doc_id", "text", "pii_email", "pii_ipv4",
                                "pii_ssn", "pii_phone", "pii_card"]
    assert out.column("pii_email").to_pylist() == [2, 0]
    assert out.column("pii_ipv4").to_pylist() == [0, 1]
    # without counts: schema unchanged
    assert scrub_batch(t).column_names == ["doc_id", "text"]


def test_scrub_dataset_and_stats(ray_session):
    import ray.data as rd

    texts = ["mail a@b.co", "ip 10.0.0.1 twice 10.0.0.2", "clean", None]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(4), pa.int64()),
                                 "text": pa.array(texts, pa.string())}))
    out = scrub_text(ds).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == [_py_mirror(s) for s in texts]
    stats = scrub_stats(ds)
    assert stats == {"email": 1, "ipv4": 2, "ssn": 0, "phone": 0, "card": 0}


def _mini_corpus():
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(40)]
    corpus = [" ".join(rng.choice(words, 25)) for _ in range(60)]
    bench = [" ".join(rng.choice(words, 25)) for _ in range(4)]
    corpus[7] = bench[0]                            # exact copy
    corpus[13] = bench[1] + " tail words here now"  # heavy overlap
    return corpus, bench


def test_decontaminate_flags_and_matches_naive(ray_session):
    import ray.data as rd

    corpus, bench = _mini_corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(corpus)), pa.int64()),
        "text": pa.array(corpus)}))
    out = decontaminate(ds, bench, ngram=8).to_pandas().set_index("doc_id")
    assert bool(out.loc[7].contaminated) and out.loc[7].overlap == 1.0
    assert bool(out.loc[13].contaminated)
    bg = benchmark_gram_union(bench, 8)
    for i in range(len(corpus)):
        naive = len(np.intersect1d(_batch_word_ngrams([corpus[i]], 8)[0], bg))
        assert int(out.loc[i].hits) == naive
    # threshold mode: only the full copy survives a 0.99 bar
    strict = decontaminate(ds, bench, ngram=8,
                           threshold=0.99).to_pandas().set_index("doc_id")
    assert strict["contaminated"].sum() == 1 and bool(
        strict.loc[7].contaminated)


def test_decontaminate_benchmark_forms_agree(ray_session):
    import ray.data as rd

    corpus, bench = _mini_corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(corpus)), pa.int64()),
        "text": pa.array(corpus)}))
    a = decontaminate(ds, bench, ngram=8).to_pandas().sort_values("doc_id")
    bt = pa.table({"text": pa.array(bench)})
    b = decontaminate(ds, bt, ngram=8).to_pandas().sort_values("doc_id")
    bds = rd.from_arrow(bt)
    c = decontaminate(ds, bds, ngram=8).to_pandas().sort_values("doc_id")
    assert a["hits"].tolist() == b["hits"].tolist() == c["hits"].tolist()


def test_decontaminate_edges(ray_session):
    import ray.data as rd

    bench = ["short doc"]  # < ngram words -> one join-all gram
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["short doc", "", None], pa.string())}))
    out = decontaminate(ds, bench, ngram=8).to_pandas().set_index("doc_id")
    assert bool(out.loc[0].contaminated)  # exact short copy still flags
    assert not out.loc[1].contaminated and out.loc[1].n_grams == 0
    assert not out.loc[2].contaminated and out.loc[2].n_grams == 0
    with pytest.raises(ValueError, match="max_benchmark_grams"):
        decontaminate(ds, ["a b c d e f g h i j"], ngram=3,
                      max_benchmark_grams=2).take_all()


def test_gram_mult_prefix_pinned():
    """The first 5 multipliers are load-bearing for every existing n<=5
    gram hash (oracle-checked dedup queries); pin them."""
    from nem_mms_ray.ops.dedup import _GRAM_MULT

    assert _GRAM_MULT[:5].tolist() == [
        0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
        0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63]
    assert len(_GRAM_MULT) >= 16 and all(m % 2 == 1 for m in
                                         _GRAM_MULT[5:].tolist())
