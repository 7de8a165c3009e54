"""Webtable generator conformance to FIXTURES.md F1."""

import pyarrow.compute as pc

from nem_mms_ray.webtable import SCHEMA, SMALL, generate_shard, write_webtable


def test_schema_matches_input_hint():
    t = generate_shard(0, 100, 0, SMALL)
    assert t.schema.equals(SCHEMA)
    assert str(SCHEMA.field("warc_ts").type) == "timestamp[us]"


def test_deterministic_and_shard_stable():
    a = generate_shard(1, 500, 500, SMALL)
    b = generate_shard(1, 500, 500, SMALL)
    assert a.equals(b)


def test_urls_unique_and_prefixed():
    t = generate_shard(0, 3000, 0, SMALL)
    assert len(pc.unique(t.column("url"))) == 3000
    assert all(u.startswith("https://") for u in t.column("url").to_pylist()[:50])


def test_null_and_empty_semantics():
    t = generate_shard(0, 5000, 0, SMALL)
    assert t.column("html").null_count > 0
    assert t.column("text").null_count > 0
    texts = t.column("text")
    empties = pc.sum(pc.equal(pc.binary_length(texts), 0)).as_py()
    assert empties and empties > t.column("text").null_count * 0  # empty != null both present
    assert t.column("url").null_count == 0
    assert t.column("lang").null_count == 0


def test_lang_low_cardinality_zipf():
    t = generate_shard(0, 5000, 0, SMALL)
    vc = pc.value_counts(t.column("lang")).to_pylist()
    assert 5 <= len(vc) <= 30
    top = max(vc, key=lambda r: r["counts"])
    assert top["counts"] > 5000 * 0.2  # dominant language


def test_write_idempotent(tmp_path):
    p1 = write_webtable(tmp_path, 1000, shard_rows=500, cfg=SMALL)
    import os

    mtimes = [os.path.getmtime(p) for p in p1]
    p2 = write_webtable(tmp_path, 1000, shard_rows=500, cfg=SMALL)
    assert p1 == p2
    assert mtimes == [os.path.getmtime(p) for p in p2]
