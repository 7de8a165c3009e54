"""Engine CLI tests (the reference's CLI surface, /root/reference/src/main.rs)."""

import json

from nem_mms_ray.__main__ import main


def test_cli_gen_encode_verify_describe(ray_session, tmp_path, capsys):
    web = tmp_path / "web"
    out = tmp_path / "enc"

    assert main(["gen", "-o", str(web), "--rows", "2000", "--shard-rows", "1000"]) == 0
    gen = json.loads(capsys.readouterr().out.strip())
    assert gen["rows"] == 2000 and gen["files"] == 2

    inputs = sorted(str(p) for p in web.glob("*.parquet"))
    assert main(["encode", *inputs, "-o", str(out), "--target-mb", "1"]) == 0
    enc = json.loads(capsys.readouterr().out.strip())
    assert enc["rows"] == 2000 and enc["done"] == enc["partitions"] > 1

    assert main(["verify", *inputs, "-o", str(out), "--target-mb", "1"]) == 0
    ver = json.loads(capsys.readouterr().out.strip())
    assert ver["ok"] is True and ver["mismatches"] == []

    assert main(["describe", str(out)]) == 0
    desc = json.loads(capsys.readouterr().out.strip())
    assert set(desc["codecs"]) >= {"plain", "for", "bitpack", "delta", "alp",
                                   "dict", "rle", "fsst"}
    assert desc["manifest"]["rows"] == 2000
    assert desc["columns"]["lang"]["codec"] == "dict"

    # decode back to plain parquet; full content equality with the input
    import pyarrow.parquet as pq

    plain = tmp_path / "plain"
    assert main(["decode", str(out), "-o", str(plain)]) == 0
    dec = json.loads(capsys.readouterr().out.strip())
    assert dec["rows"] == 2000
    a = pq.read_table(web).sort_by("url")
    b = pq.read_table(plain).sort_by("url").select(a.column_names).cast(a.schema)
    assert a.equals(b)

    # decode resume: second run skips every existing part
    assert main(["decode", str(out), "-o", str(plain)]) == 0
    dec2 = json.loads(capsys.readouterr().out.strip())
    assert dec2["rows"] == 2000
    from nem_mms_ray.pipelines.decode import decode_files

    assert decode_files(out, plain).to_pandas()["skipped"].all()

    # resume: re-encode skips every done partition
    assert main(["encode", *inputs, "-o", str(out), "--target-mb", "1"]) == 0
    again = json.loads(capsys.readouterr().out.strip())
    assert again["skipped"] == enc["partitions"]

    # CLI must not tear down the caller's (the test session's) ray
    import ray

    assert ray.is_initialized()


def test_cli_curate(ray_session, tmp_path, capsys):
    main(["curate", "/root/testdata/sf0.001/documents.parquet",
          "-o", str(tmp_path / "cur"), "--quality-min", "0.5"])
    res = json.loads(capsys.readouterr().out.strip())
    assert res["input_rows"] == 500 and 0 < res["curated_rows"] <= 500


def test_cli_scan(ray_session, tmp_path, capsys):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nem_mms_ray.pipelines.encode import encode_files

    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({"k": pa.array(np.arange(5000, dtype=np.int64))}),
                   src, row_group_size=1000)
    enc = tmp_path / "enc"
    encode_files([str(src)], enc, target_bytes=1 << 16).to_pandas()
    assert main(["scan", str(enc), "-o", str(tmp_path / "out"),
                 "--columns", "k", "--range", "k", "100", "200"]) == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["rows"] == 101


def test_cli_curate_with_text(ray_session, tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from nem_mms_ray.__main__ import main

    main(["curate", "/root/testdata/sf0.001/documents.parquet",
          "-o", str(tmp_path / "cur"), "--lang", "en", "--with-text"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < res["curated_rows"] <= 500
    t = pq.read_table(str(tmp_path / "cur"))
    assert set(t.column_names) >= {"doc_id", "text", "lang_pred", "quality"}
    assert t.num_rows == res["curated_rows"]


def test_cli_near_dedup(ray_session, tmp_path, capsys):
    import json

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow as pa

    from nem_mms_ray.__main__ import main

    rng = np.random.default_rng(8)
    vocab = [f"w{i}" for i in range(4000)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(120)]
    texts[50] = texts[10]
    texts[51] = texts[10]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                             "text": pa.array(texts)}), str(src))
    main(["near-dedup", str(src), "-o", str(tmp_path / "nd"), "--threshold", "0.9"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["near_dup_nodes"] == 3 and res["clusters"] == 1
    t = pq.read_table(str(tmp_path / "nd")).to_pandas()
    assert dict(zip(t["id"], t["component"])) == {10: 10, 50: 10, 51: 10}


def test_cli_scrub(ray_session, tmp_path, capsys):
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nem_mms_ray.__main__ import main

    texts = ["mail a@b.co now", "ip 10.0.0.1 and 10.0.0.2", "clean words"]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(3, dtype=np.int64)),
                             "text": pa.array(texts)}), str(src))
    assert main(["scrub", str(src), "-o", str(tmp_path / "sc")]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 3
    assert res["redactions"] == {"email": 1, "ipv4": 2, "ssn": 0,
                                 "phone": 0, "card": 0}
    t = pq.read_table(str(tmp_path / "sc")).to_pandas().set_index("doc_id")
    assert t.loc[0, "text"] == "mail <EMAIL> now"
    assert t.loc[1, "text"] == "ip <IP> and <IP>"
    assert t.loc[2, "text"] == "clean words"


def test_cli_decontam(ray_session, tmp_path, capsys):
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nem_mms_ray.__main__ import main

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, 25)) for _ in range(40)]
    bench_texts = [texts[5], " ".join(rng.choice(vocab, 25))]
    src = tmp_path / "docs.parquet"
    bench = tmp_path / "bench.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64)),
                             "text": pa.array(texts)}), str(src))
    pq.write_table(pa.table({"text": pa.array(bench_texts)}), str(bench))
    assert main(["decontam", str(src), "-o", str(tmp_path / "dc"),
                 "--benchmark", str(bench)]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 40 and res["contaminated"] == 1
    t = pq.read_table(str(tmp_path / "dc")).to_pandas().set_index("doc_id")
    assert bool(t.loc[5, "contaminated"]) and t.loc[5, "overlap"] == 1.0


def test_cli_chunk_then_pack(ray_session, tmp_path, capsys):
    """chunk -> pack end-to-end through the CLI: windows are re-packed to
    the token budget, chunk's n_tokens column trusted without a recount."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nem_mms_ray.__main__ import main

    rng = np.random.default_rng(21)
    texts = [" ".join(f"d{i}w{j}" for j in range(n))
             for i, n in enumerate(rng.integers(1, 60, 30))]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(30, dtype=np.int64)),
                             "text": pa.array(texts)}), str(src))

    assert main(["chunk", str(src), "-o", str(tmp_path / "ch"),
                 "--max-tokens", "8"]) == 0
    ch = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ch["chunks"] > 30

    assert main(["pack", str(tmp_path / "ch"), "-o", str(tmp_path / "pk"),
                 "--budget", "24", "--n-buckets", "4",
                 "--order-cols", "chunk_id", "--n-tokens-col", "n_tokens"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = pq.read_table(str(tmp_path / "pk")).to_pandas()
    assert res["packs"] == len(t) and res["mode"] == "next_fit"
    assert (t["n_tokens"] <= 24).all()  # chunks are <=8, no oversized packs
    assert int(t["n_tokens"].sum()) == sum(len(s.split()) for s in texts)


def test_cli_bpe_train_and_reapply(ray_session, tmp_path, capsys):
    """bpe end-to-end through the CLI: train writes counts + a merges
    sidecar; --merges-in re-applies the SAME tokenizer to new docs with
    identical segmentation (the index-once/apply-many contract)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nem_mms_ray.__main__ import main

    texts = [f"alpha beta gamma alpha w{i}" for i in range(40)]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts, pa.string())}), str(src))

    assert main(["bpe", str(src), "-o", str(tmp_path / "b1"),
                 "--n-merges", "50", "--max-words", "100"]) == 0
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["rows"] == 40 and r1["merges"] > 0
    merges_path = tmp_path / "b1" / "bpe_merges.json"
    assert merges_path.exists()

    assert main(["bpe", str(src), "-o", str(tmp_path / "b2"),
                 "--merges-in", str(merges_path)]) == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["merges"] == r1["merges"]
    c1 = pq.read_table(str(tmp_path / "b1"), ignore_prefixes=["bpe_"],
                       ).to_pandas().sort_values("doc_id")
    c2 = pq.read_table(str(tmp_path / "b2"), ignore_prefixes=["bpe_"],
                       ).to_pandas().sort_values("doc_id")
    assert c1["n_bpe_tokens"].tolist() == c2["n_bpe_tokens"].tolist()
    assert (c1["n_bpe_tokens"] >= 5).all()  # >= one token per word


def test_cli_winnow_and_lm(ray_session, tmp_path, capsys):
    """The winnow and lm arms end to end: substring-cluster collapse keeps
    the representative; lm scoring writes (doc_id, lm_bits) with sane
    stats JSON."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    core = " ".join(f"core{i:03d}" for i in range(60))
    rng = np.random.default_rng(2)
    vocab = [f"v{i}" for i in range(200)]
    texts = [core, f"pre {core}", " ".join(rng.choice(vocab, 80)),
             " ".join(rng.choice(vocab, 80))]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(range(4), pa.int64()),
                             "text": pa.array(texts)}), src)

    assert main(["winnow", str(src), "-o", str(tmp_path / "kept"),
                 "--min-containment", "0.9"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rows_in"] == 4 and out["rows_kept"] == 3
    kept = pq.read_table(sorted((tmp_path / "kept").glob("*.parquet")))
    assert sorted(kept.column("doc_id").to_pylist()) == [0, 2, 3]

    assert main(["lm", str(src), "-o", str(tmp_path / "scored")]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rows"] == 4 and out["ngram_types"] > 0
    scored = pq.read_table(sorted((tmp_path / "scored").glob("*.parquet")))
    assert scored.column_names == ["doc_id", "lm_bits"]
    assert out["bits_mean"] > 0


def test_cli_semdedup(ray_session, tmp_path, capsys):
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import pyarrow as pa

    from nem_mms_ray.__main__ import main

    rng = np.random.default_rng(13)
    x = rng.normal(size=(60, 8))
    x[40] = x[5] * 2.0   # scaled copies: cosine exactly 1.0
    x[41] = x[6] * 3.0
    src = tmp_path / "emb.parquet"
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(60, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in x]),
    }), str(src))
    main(["semdedup", str(src), "-o", str(tmp_path / "sd"),
          "--clusters", "4", "--threshold", "0.95"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows_in"] == 60
    assert res["semantic_dups_dropped"] == 2
    t = pq.read_table(str(tmp_path / "sd")).to_pandas()
    kept = set(t["vec_id"])
    assert 5 in kept and 6 in kept
    assert 40 not in kept and 41 not in kept


def test_cli_shard(ray_session, tmp_path, capsys):
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import pyarrow as pa

    from nem_mms_ray.__main__ import main

    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(300, dtype=np.int64)),
        "text": pa.array([f"d{i}" for i in range(300)]),
    }), str(src))
    main(["shard", str(src), "-o", str(tmp_path / "sh"),
          "--shards", "3", "--seed", "5"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res == {"rows": 300, "n_shards": 3}
    dirs = sorted(p.name for p in (tmp_path / "sh").iterdir() if p.is_dir())
    assert dirs == ["shard_id=0", "shard_id=1", "shard_id=2"]
