"""Engine CLI: encode / verify / describe / gen.

The target-side analog of the reference CLI (`nem-mms parse|info|manage`,
/root/reference/src/main.rs:92-152): `encode` is `parse` (input -> encoded
columnar output + manifest), `verify` is the round-trip check the reference
only had as unit tests, `describe` is `info` + `manage` (codec registry +
manifest metrics of a depository), `gen` synthesizes the FIXTURES webtable.

Owns its Ray session (library code never calls ray.init — driver contract).

Usage:
  python -m nem_mms_ray encode IN.parquet [IN2...] -o OUT_DIR [--target-mb 64]
  python -m nem_mms_ray verify IN.parquet [IN2...] -o OUT_DIR [--target-mb 64]
  python -m nem_mms_ray decode OUT_DIR -o PLAIN_DIR
  python -m nem_mms_ray describe OUT_DIR [--fsck [--repair]]
         # --fsck: manifest-vs-disk reconciliation (the reference's
         # stubbed `manage update`, implemented); --repair deletes
         # stale records/orphans so resume re-encodes them
  python -m nem_mms_ray gen -o DIR --rows 50000
  python -m nem_mms_ray curate DOCS.parquet -o OUT.parquet \
         [--quality-min 0.5] [--lang en]
  python -m nem_mms_ray scan ENC_DIR -o OUT_DIR [--columns a,b] \
         [--range col lo hi ...]   # zone-map predicate pushdown
  python -m nem_mms_ray near-dedup DOCS.parquet -o OUT.parquet \
         [--threshold 0.8]         # minhash pairs -> cluster components
  python -m nem_mms_ray web WEB.parquet [WEB2...] -o OUT_DIR \
         [--quality-min 0.5] [--lang en] [--near-dedup] [--verify] \
         [--lm-max-bits 1.2 [--lm-ref TRUSTED.parquet] [--lm-ngram 3]] \
         [--shards 64 [--shard-seed 0]]
         # the composed flagship: extract -> curate -> encode, with
         # stage-level checkpoint resume; --lm-max-bits adds the CCNet
         # perplexity filter; --shards also writes the curated corpus
         # as deterministic training shards
  python -m nem_mms_ray semdedup EMB.parquet -o OUT_DIR \
         [--clusters 16] [--threshold 0.95] [--kmeans-iters 2]
         # SemDeDup: within-k-means-cluster cosine prune
  python -m nem_mms_ray shard DOCS.parquet -o OUT_DIR \
         [--shards 8] [--seed 0]
         # deterministic global shuffle -> hive training shards
  python -m nem_mms_ray winnow DOCS.parquet -o OUT_DIR \
         [--min-containment 0.5] [--k 8] [--window 4]
         # substring-level dedup: winnowing fingerprints -> clusters ->
         # keep each cluster's min-id representative
  python -m nem_mms_ray lm DOCS.parquet -o OUT_DIR [--ref TRUSTED.parquet]
         # char n-gram LM bits/char scoring (the CCNet filter signal)
  python -m nem_mms_ray scrub DOCS.parquet -o OUT_DIR
         # PII redaction (email/IP/SSN/phone/card) + corpus match totals
  python -m nem_mms_ray decontam DOCS.parquet -o OUT_DIR \
         --benchmark EVAL.parquet [--ngram 8] [--threshold 0]
         # benchmark n-gram decontamination flags
  python -m nem_mms_ray chunk DOCS.parquet -o OUT_DIR \
         [--max-tokens 512] [--stride 512]
         # context-window packing: one row per token window
  python -m nem_mms_ray pack CHUNKS_DIR -o OUT_DIR --budget 2048 \
         [--mode next_fit|stream] [--order-cols chunk_id] \
         [--n-tokens-col n_tokens]
         # sequence packing: combine short sequences into full
         # training rows (chunk's downstream step)
  python -m nem_mms_ray bpe DOCS.parquet -o OUT_DIR \
         [--n-merges 1000] [--max-words 100000] [--merges-in MERGES.json]
         # BPE tokenizer: distributed word count -> driver merge loop ->
         # per-doc subword counts; merges saved to OUT_DIR/bpe_merges.json
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    """Own a session only if none exists (never tear down a caller's)."""
    import ray

    owned = not ray.is_initialized()
    if owned:
        kw = {"num_cpus": num_cpus} if num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)
    return ray, owned


def _expand_inputs(inputs: list[str]) -> list[str]:
    """Directories expand to their *.parquet members (sorted)."""
    from pathlib import Path

    out: list[str] = []
    for p in inputs:
        pp = Path(p)
        if pp.is_dir():
            out.extend(sorted(str(f) for f in pp.glob("*.parquet")))
        else:
            out.append(str(pp))
    return out


def cmd_encode(args) -> int:
    ray, owned = _init_ray(args.num_cpus)
    from nem_mms_ray.pipelines.encode import encode_files
    from nem_mms_ray.state.manifest import Manifest

    cols = args.columns.split(",") if args.columns else None
    df = encode_files(_expand_inputs(args.inputs), args.out, columns=cols,
                      target_bytes=args.target_mb << 20).to_pandas()
    summ = Manifest(args.out).summary()
    print(json.dumps({"partitions_run": len(df),
                      "skipped": int(df["skipped"].sum()), **summ}))
    if owned:
        ray.shutdown()
    return 0


def cmd_verify(args) -> int:
    ray, owned = _init_ray(args.num_cpus)
    from nem_mms_ray.pipelines.decode import verify_files

    cols = args.columns.split(",") if args.columns else None
    df = verify_files(_expand_inputs(args.inputs), args.out, columns=cols,
                      target_bytes=args.target_mb << 20).to_pandas()
    ok = bool(df["ok"].all())
    bad = df.loc[~df["ok"], ["pid", "mismatched_columns"]].to_dict("records")
    print(json.dumps({"partitions": len(df), "ok": ok, "mismatches": bad}))
    if owned:
        ray.shutdown()
    return 0 if ok else 1


def cmd_decode(args) -> int:
    ray, owned = _init_ray(args.num_cpus)
    from nem_mms_ray.pipelines.decode import decode_files

    df = decode_files(args.enc_dir, args.out).to_pandas()
    print(json.dumps({"partitions": len(df), "rows": int(df["rows"].sum())}))
    if owned:
        ray.shutdown()
    return 0


def cmd_scan(args) -> int:
    """Predicate-pushdown scan over an encoded dir; writes matching rows as
    plain parquet.  Bounds parse as float, int, then ISO timestamp."""
    ray, owned = _init_ray(args.num_cpus)
    from nem_mms_ray.pipelines.decode import scan_encoded

    def parse_bound(x: str):
        if x in ("none", "None", ""):
            return None
        for cast in (int, float):
            try:
                return cast(x)
            except ValueError:
                pass
        import pandas as pd

        return pd.Timestamp(x)

    filters = {col: (parse_bound(lo), parse_bound(hi))
               for col, lo, hi in (args.range or [])}
    cols = args.columns.split(",") if args.columns else None
    ds = scan_encoded(args.enc_dir, columns=cols, range_filters=filters or None)
    ds.write_parquet(args.out)
    import ray.data as rd

    n = rd.read_parquet(args.out).count()
    print(json.dumps({"rows": n, "out": args.out}))
    if owned:
        ray.shutdown()
    return 0


def cmd_near_dedup(args) -> int:
    """MinHash+LSH near-dup pairs over a documents table, collapsed to
    clusters by min-label propagation; writes (id, component) parquet —
    keep rows where id == component, drop the rest."""
    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.dedup import connected_components, minhash_dedup

    ds = rd.read_parquet(args.inputs, columns=[args.id_col, args.text_col])
    if args.id_col != "doc_id" or args.text_col != "text":
        cols = {args.id_col: "doc_id", args.text_col: "text"}
        ds = ds.map_batches(
            lambda t: t.rename_columns([cols.get(c, c) for c in t.column_names]),
            batch_format="pyarrow")
    pairs = minhash_dedup(ds, threshold=args.threshold)
    comps = connected_components(pairs)
    comps.write_parquet(args.out)
    import ray.data as _rd

    written = _rd.read_parquet(args.out)
    n_nodes = written.count()
    n_comps = written.groupby("component").count().count()
    print(json.dumps({"near_dup_nodes": int(n_nodes),
                      "clusters": int(n_comps),
                      "duplicates_to_drop": int(n_nodes - n_comps)}))
    if owned:
        ray.shutdown()
    return 0


def cmd_semdedup(args) -> int:
    """SemDeDup semantic dedup over an embeddings table: k-means
    centroids (deterministic sample, optionally refined by distributed
    Lloyd iterations) -> nearest-centroid assignment -> within-cluster
    cosine prune; writes the SURVIVING (id, cluster) rows as parquet."""
    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.ann import build_ivf_centroids, train_kmeans
    from nem_mms_ray.ops.semdedup import semdedup

    ds = rd.read_parquet(args.inputs, columns=[args.id_col, args.vec_col])
    cents = build_ivf_centroids(ds, args.clusters, args.vec_col)
    if args.kmeans_iters > 0:
        cents, _ = train_kmeans(ds, args.clusters, args.vec_col,
                                n_iters=args.kmeans_iters, init=cents)
    kept = semdedup(ds, cents, threshold=args.threshold,
                    id_col=args.id_col, vec_col=args.vec_col)
    kept.write_parquet(args.out)
    n_in = ds.count()
    n_kept = rd.read_parquet(args.out).count()
    print(json.dumps({"rows_in": int(n_in), "rows_kept": int(n_kept),
                      "semantic_dups_dropped": int(n_in - n_kept),
                      "clusters": int(args.clusters)}))
    if owned:
        ray.shutdown()
    return 0


def cmd_shard(args) -> int:
    """Deterministic shuffle-shard: the training-output step.  Same
    corpus + same seed => byte-identical shard layout on any cluster."""
    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.shard import write_training_shards

    ds = rd.read_parquet(args.inputs)
    res = write_training_shards(ds, args.out, n_shards=args.shards,
                                seed=args.seed, id_col=args.id_col)
    print(json.dumps(res))
    if owned:
        ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    """Quality/lang gate + exact dedup over a documents table; writes the
    surviving (doc_id, lang_pred, quality) labels as parquet — or, with
    --with-text, the curated DATA (text semi-joined back to the winners)."""
    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.curate import curate_documents, curate_documents_with_text

    if args.with_text:
        out = curate_documents_with_text(
            lambda: rd.read_parquet(args.inputs,
                                    columns=[args.id_col, args.text_col]),
            quality_min=args.quality_min, lang=args.lang,
            id_col=args.id_col, text_col=args.text_col)
    else:
        ds = rd.read_parquet(args.inputs, columns=[args.id_col, args.text_col])
        out = curate_documents(ds, quality_min=args.quality_min, lang=args.lang,
                               id_col=args.id_col, text_col=args.text_col)
    out.write_parquet(args.out)
    n_in = rd.read_parquet(args.inputs).count()
    n_out = rd.read_parquet(args.out).count()
    print(json.dumps({"input_rows": n_in, "curated_rows": n_out,
                      "kept_pct": round(100.0 * n_out / max(1, n_in), 2)}))
    if owned:
        ray.shutdown()
    return 0


def cmd_web(args) -> int:
    """extract -> curate -> encode over a web table (pipelines/web.py);
    stage outputs are checkpoints, the summary JSON is per-stage."""
    ray, owned = _init_ray(args.num_cpus)
    from nem_mms_ray.pipelines.web import web_pipeline

    summary = web_pipeline(
        args.inputs, args.out, quality_min=args.quality_min, lang=args.lang,
        near_dedup=args.near_dedup, threshold=args.threshold,
        verify=args.verify, resume=not args.no_resume,
        scrub=args.scrub, domain_cap=args.domain_cap,
        benchmark_paths=args.benchmark or None,
        decontam_ngram=args.decontam_ngram,
        lm_max_bits=args.lm_max_bits, lm_ref_paths=args.lm_ref or None,
        lm_ngram=args.lm_ngram, shards=args.shards,
        shard_seed=args.shard_seed)
    print(json.dumps(summary))
    if owned:
        ray.shutdown()
    return 0


def cmd_describe(args) -> int:
    """Codec registry + manifest metrics — no Ray session needed.
    --fsck reconciles the manifest against the on-disk encoded files
    (the reference's `manage update`, implemented: main.rs:148-150 stubs
    it); --repair deletes stale records/orphans so resume re-encodes."""
    from nem_mms_ray.codecs import REGISTRY
    from nem_mms_ray.state.manifest import Manifest

    if getattr(args, "fsck", False):
        if not args.out_dir:
            print("describe --fsck requires OUT_DIR", file=sys.stderr)
            return 2
        try:
            rep = Manifest(args.out_dir).fsck(repair=args.repair)
        except FileNotFoundError as e:
            print(str(e), file=sys.stderr)
            return 2
        print(json.dumps(rep, indent=2))
        return 0 if rep["clean"] or args.repair else 1

    out = {"codecs": {}}
    for name in sorted(REGISTRY):
        c = REGISTRY[name]
        doc = (c.__doc__ or "").strip().splitlines()
        out["codecs"][name] = doc[0] if doc else type(c).__name__
    if args.out_dir:
        m = Manifest(args.out_dir)
        out["manifest"] = m.summary()
        per_col: dict[str, dict] = {}
        for r in m.load_all():
            if not r.done:
                continue
            for col, codec in r.codecs.items():
                e = per_col.setdefault(col, {"codec": codec, "orig": 0, "encoded": 0})
                ob, eb = r.column_bytes.get(col, [0, 0])
                e["orig"] += ob
                e["encoded"] += eb
        for col, e in per_col.items():
            e["ratio"] = round(e["encoded"] / e["orig"], 4) if e["orig"] else 0.0
        out["columns"] = per_col
    print(json.dumps(out, indent=2))
    return 0


def cmd_scrub(args) -> int:
    """PII-redact the text column of a documents table; writes the scrubbed
    rows as parquet and prints the corpus-level per-pattern match totals."""
    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.scrub import scrub_stats, scrub_text

    ds = rd.read_parquet(_expand_inputs(args.inputs))
    scrub_text(ds, text_col=args.text_col).write_parquet(args.out)
    stats = scrub_stats(ds, text_col=args.text_col)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"rows": int(n), "redactions": stats}))
    if owned:
        ray.shutdown()
    return 0


def cmd_winnow(args) -> int:
    """Substring-level dedup (winnowing local fingerprints): drop all but
    each substring-sharing cluster's min-id representative; writes the
    surviving rows as parquet."""
    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.winnow import winnow_dedup

    ds = rd.read_parquet(_expand_inputs(args.inputs))
    n_in = ds.count()
    kept = winnow_dedup(ds, min_containment=args.min_containment,
                        k=args.k, window=args.window,
                        id_col=args.id_col, text_col=args.text_col)
    kept.write_parquet(args.out)
    n_out = rd.read_parquet(args.out).count()
    print(json.dumps({"rows_in": int(n_in), "rows_kept": int(n_out),
                      "dropped": int(n_in - n_out)}))
    if owned:
        ray.shutdown()
    return 0


def cmd_lm(args) -> int:
    """Char n-gram LM perplexity scoring (the CCNet filter signal): train
    on --ref (or the corpus itself) and write (id, lm_bits) parquet."""
    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.charlm import lm_score, train_char_lm

    ref = rd.read_parquet(_expand_inputs(args.ref), columns=[args.text_col]) \
        if args.ref else rd.read_parquet(_expand_inputs(args.inputs),
                                         columns=[args.text_col])
    model = train_char_lm(ref, n=args.n, text_col=args.text_col,
                          min_count=args.min_count)
    scored = lm_score(
        rd.read_parquet(_expand_inputs(args.inputs),
                        columns=[args.id_col, args.text_col]),
        model, id_col=args.id_col, text_col=args.text_col)
    scored.write_parquet(args.out)
    import pyarrow.parquet as pq

    bits = pq.read_table(args.out).column("lm_bits").to_pandas()
    print(json.dumps({"rows": int(len(bits)), "ngram_types": model.n_types,
                      "charset": model.v,
                      "bits_mean": round(float(bits.mean()), 4),
                      "bits_p90": round(float(bits.quantile(0.9)), 4)}))
    if owned:
        ray.shutdown()
    return 0


def cmd_decontam(args) -> int:
    """Flag corpus docs sharing word n-grams with a benchmark parquet
    (same text column); writes (doc_id, n_grams, hits, overlap,
    contaminated) parquet."""
    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.decontam import decontaminate

    ds = rd.read_parquet(_expand_inputs(args.inputs),
                         columns=[args.id_col, args.text_col])
    bench = rd.read_parquet(_expand_inputs([args.benchmark]),
                            columns=[args.text_col])
    out = decontaminate(ds, bench, ngram=args.ngram,
                        threshold=args.threshold, id_col=args.id_col,
                        text_col=args.text_col)
    out.write_parquet(args.out)
    import pyarrow as pa
    import pyarrow.compute as pc

    written = rd.read_parquet(args.out)
    n = written.count()
    n_bad = int(written.map_batches(
        lambda t: {"c": [int(pc.sum(t.column("contaminated").cast(
            pa.int64())).as_py() or 0)]},
        batch_format="pyarrow").sum("c") or 0)
    print(json.dumps({"rows": int(n), "contaminated": n_bad}))
    if owned:
        ray.shutdown()
    return 0


def cmd_chunk(args) -> int:
    """Split each doc's text into fixed-size token windows (context-window
    packing); writes (doc_id, chunk_id, text, n_tokens) parquet."""
    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.chunking import chunk_documents

    ds = rd.read_parquet(_expand_inputs(args.inputs),
                         columns=[args.id_col, args.text_col])
    chunk_documents(ds, max_tokens=args.max_tokens, stride=args.stride,
                    id_col=args.id_col,
                    text_col=args.text_col).write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"chunks": int(n), "max_tokens": args.max_tokens,
                      "stride": args.stride or args.max_tokens}))
    if owned:
        ray.shutdown()
    return 0


def cmd_pack(args) -> int:
    """Pack sequences into fixed-token-budget training rows (next-fit or
    stream discipline); writes (bucket, pack_id, text, n_tokens[, n_seqs])
    parquet."""
    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.packing import pack_sequences

    cols = [args.id_col, args.text_col, *args.order_cols]
    if args.n_tokens_col:
        cols.append(args.n_tokens_col)
    ds = rd.read_parquet(_expand_inputs(args.inputs), columns=cols)
    pack_sequences(ds, budget=args.budget, mode=args.mode,
                   n_buckets=args.n_buckets, id_col=args.id_col,
                   order_cols=tuple(args.order_cols),
                   text_col=args.text_col,
                   n_tokens_col=args.n_tokens_col).write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"packs": int(n), "budget": args.budget,
                      "mode": args.mode}))
    if owned:
        ray.shutdown()
    return 0


def cmd_bpe(args) -> int:
    """Train a BPE vocabulary on the corpus's word frequencies, apply it,
    and write per-doc subword counts; the learned merges go to a JSON
    sidecar so a later run can re-apply the same tokenizer."""
    from pathlib import Path

    ray, owned = _init_ray(args.num_cpus)
    import ray.data as rd

    from nem_mms_ray.ops.bpe import apply_bpe, train_bpe, word_frequencies

    ds = rd.read_parquet(_expand_inputs(args.inputs),
                         columns=[args.id_col, args.text_col])
    if args.merges_in:
        merges = [tuple(p) for p in
                  json.loads(Path(args.merges_in).read_text())["merges"]]
    else:
        merges = train_bpe(
            word_frequencies(ds, text_col=args.text_col,
                             max_words=args.max_words),
            n_merges=args.n_merges, min_freq=args.min_freq)
    apply_bpe(ds, merges, text_col=args.text_col,
              id_col=args.id_col).write_parquet(args.out)
    out_dir = Path(args.out)
    (out_dir / "bpe_merges.json").write_text(
        json.dumps({"merges": merges, "n_merges": len(merges)}))
    n = rd.read_parquet(
        args.out, file_extensions=["parquet"]).count()
    print(json.dumps({"rows": int(n), "merges": len(merges)}))
    if owned:
        ray.shutdown()
    return 0


def cmd_gen(args) -> int:
    from nem_mms_ray.webtable import write_webtable

    paths = write_webtable(args.out, args.rows, shard_rows=args.shard_rows)
    print(json.dumps({"rows": args.rows, "files": len(paths), "dir": str(args.out)}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="nem_mms_ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode", help="encode parquet inputs into codec partitions")
    pe.add_argument("inputs", nargs="+")
    pe.add_argument("-o", "--out", required=True)
    pe.add_argument("--target-mb", type=int, default=64)
    pe.add_argument("--columns", default=None,
                    help="comma-separated column projection")
    pe.add_argument("--num-cpus", type=int, default=None)
    pe.set_defaults(fn=cmd_encode)

    pv = sub.add_parser("verify", help="decode + bit-identical round-trip check")
    pv.add_argument("inputs", nargs="+")
    pv.add_argument("-o", "--out", required=True)
    pv.add_argument("--target-mb", type=int, default=64)
    pv.add_argument("--columns", default=None,
                    help="comma-separated column projection")
    pv.add_argument("--num-cpus", type=int, default=None)
    pv.set_defaults(fn=cmd_verify)

    pdc = sub.add_parser("decode", help="decode encoded partitions back to plain parquet")
    pdc.add_argument("enc_dir")
    pdc.add_argument("-o", "--out", required=True)
    pdc.add_argument("--num-cpus", type=int, default=None)
    pdc.set_defaults(fn=cmd_decode)

    pd_ = sub.add_parser("describe", help="codec registry + manifest metrics")
    pd_.add_argument("out_dir", nargs="?", default=None)
    pd_.add_argument("--fsck", action="store_true",
                     help="reconcile manifest vs on-disk encoded files"
                          " (missing outputs, size drift, orphans);"
                          " exit 1 if findings")
    pd_.add_argument("--repair", action="store_true",
                     help="with --fsck: delete stale records + orphan files"
                          " so a resume re-encodes exactly those partitions")
    pd_.set_defaults(fn=cmd_describe)

    ps = sub.add_parser("scan", help="zone-map range scan over encoded partitions")
    ps.add_argument("enc_dir")
    ps.add_argument("-o", "--out", required=True)
    ps.add_argument("--columns", default=None)
    ps.add_argument("--range", nargs=3, action="append",
                    metavar=("COL", "LO", "HI"))
    ps.add_argument("--num-cpus", type=int, default=None)
    ps.set_defaults(fn=cmd_scan)

    pc = sub.add_parser("curate", help="quality/lang gate + exact dedup over documents")
    pc.add_argument("inputs", nargs="+")
    pc.add_argument("-o", "--out", required=True)
    pc.add_argument("--quality-min", type=float, default=0.5)
    pc.add_argument("--lang", default=None)
    pc.add_argument("--id-col", default="doc_id")
    pc.add_argument("--text-col", default="text")
    pc.add_argument("--with-text", action="store_true",
                    help="semi-join winners back to full rows (curated data,"
                         " not just labels); reads the corpus twice")
    pc.add_argument("--num-cpus", type=int, default=None)
    pc.set_defaults(fn=cmd_curate)

    pn = sub.add_parser("near-dedup",
                        help="minhash near-dup pairs -> connected components"
                             " -> (id, component) parquet")
    pn.add_argument("inputs", nargs="+")
    pn.add_argument("-o", "--out", required=True)
    pn.add_argument("--threshold", type=float, default=0.8)
    pn.add_argument("--id-col", default="doc_id")
    pn.add_argument("--text-col", default="text")
    pn.add_argument("--num-cpus", type=int, default=None)
    pn.set_defaults(fn=cmd_near_dedup)

    psd = sub.add_parser("semdedup",
                         help="semantic dedup: k-means clusters -> within-"
                              "cluster cosine prune -> surviving (id, "
                              "cluster) parquet")
    psd.add_argument("inputs", nargs="+")
    psd.add_argument("-o", "--out", required=True)
    psd.add_argument("--threshold", type=float, default=0.95)
    psd.add_argument("--clusters", type=int, default=16)
    psd.add_argument("--kmeans-iters", type=int, default=0,
                     help="distributed Lloyd refinement passes over the "
                          "full corpus (0 = deterministic sample centroids)")
    psd.add_argument("--id-col", default="vec_id")
    psd.add_argument("--vec-col", default="embedding")
    psd.add_argument("--num-cpus", type=int, default=None)
    psd.set_defaults(fn=cmd_semdedup)

    psh = sub.add_parser("shard",
                         help="deterministic global shuffle -> hive-"
                              "partitioned training shards (pure function "
                              "of seed + id: identical on any cluster)")
    psh.add_argument("inputs", nargs="+")
    psh.add_argument("-o", "--out", required=True)
    psh.add_argument("--shards", type=int, default=8)
    psh.add_argument("--seed", type=int, default=0)
    psh.add_argument("--id-col", default="doc_id")
    psh.add_argument("--num-cpus", type=int, default=None)
    psh.set_defaults(fn=cmd_shard)

    pw = sub.add_parser("web", help="composed flagship: extract -> curate"
                                    " -> encode with stage checkpoints")
    pw.add_argument("inputs", nargs="+")
    pw.add_argument("-o", "--out", required=True)
    pw.add_argument("--quality-min", type=float, default=0.0)
    pw.add_argument("--lang", default=None)
    pw.add_argument("--near-dedup", action="store_true")
    pw.add_argument("--threshold", type=float, default=1.0)
    pw.add_argument("--verify", action="store_true")
    pw.add_argument("--no-resume", action="store_true")
    pw.add_argument("--scrub", action="store_true",
                    help="PII-redact extracted text before curation")
    pw.add_argument("--domain-cap", type=int, default=None,
                    help="keep at most N docs per host (pre-curation)")
    pw.add_argument("--benchmark", nargs="+", default=None,
                    help="benchmark parquet(s); drop docs sharing word "
                         "n-grams with them (post-dedup)")
    pw.add_argument("--decontam-ngram", type=int, default=8)
    pw.add_argument("--lm-max-bits", type=float, default=None,
                    help="drop docs above this bits/char under a char "
                         "n-gram LM (the CCNet perplexity filter)")
    pw.add_argument("--lm-ref", nargs="+", default=None,
                    help="trusted-text parquet(s) to train the LM on "
                         "(default: the curated corpus itself)")
    pw.add_argument("--lm-ngram", type=int, default=3)
    pw.add_argument("--shards", type=int, default=None,
                    help="also write the curated corpus as N training "
                         "shards (deterministic shuffle, ops/shard)")
    pw.add_argument("--shard-seed", type=int, default=0)
    pw.add_argument("--num-cpus", type=int, default=None)
    pw.set_defaults(fn=cmd_web)

    psc = sub.add_parser("scrub", help="PII-redact the text column"
                                       " (email/IP/SSN/phone/card)")
    psc.add_argument("inputs", nargs="+")
    psc.add_argument("-o", "--out", required=True)
    psc.add_argument("--text-col", default="text")
    psc.add_argument("--num-cpus", type=int, default=None)
    psc.set_defaults(fn=cmd_scrub)

    pwn = sub.add_parser("winnow", help="substring-level dedup: winnowing"
                                        " fingerprints -> clusters -> keep"
                                        " representative")
    pwn.add_argument("inputs", nargs="+")
    pwn.add_argument("-o", "--out", required=True)
    pwn.add_argument("--min-containment", type=float, default=0.5)
    pwn.add_argument("--k", type=int, default=8)
    pwn.add_argument("--window", type=int, default=4)
    pwn.add_argument("--id-col", default="doc_id")
    pwn.add_argument("--text-col", default="text")
    pwn.add_argument("--num-cpus", type=int, default=None)
    pwn.set_defaults(fn=cmd_winnow)

    plm = sub.add_parser("lm", help="char n-gram LM perplexity scoring"
                                    " (CCNet filter signal)")
    plm.add_argument("inputs", nargs="+")
    plm.add_argument("-o", "--out", required=True)
    plm.add_argument("--ref", nargs="+", default=None,
                     help="trusted-text parquet(s) to train on"
                          " (default: the corpus itself)")
    plm.add_argument("--n", type=int, default=3)
    plm.add_argument("--min-count", type=int, default=1)
    plm.add_argument("--id-col", default="doc_id")
    plm.add_argument("--text-col", default="text")
    plm.add_argument("--num-cpus", type=int, default=None)
    plm.set_defaults(fn=cmd_lm)

    pdx = sub.add_parser("decontam",
                         help="flag docs sharing word n-grams with a"
                              " benchmark parquet")
    pdx.add_argument("inputs", nargs="+")
    pdx.add_argument("-o", "--out", required=True)
    pdx.add_argument("--benchmark", required=True,
                     help="parquet file/dir with the benchmark texts")
    pdx.add_argument("--ngram", type=int, default=8)
    pdx.add_argument("--threshold", type=float, default=0.0,
                     help="0 = any shared n-gram flags; else min overlap"
                          " share of the doc's own grams")
    pdx.add_argument("--id-col", default="doc_id")
    pdx.add_argument("--text-col", default="text")
    pdx.add_argument("--num-cpus", type=int, default=None)
    pdx.set_defaults(fn=cmd_decontam)

    pck = sub.add_parser("chunk",
                         help="split docs into fixed-size token windows"
                              " (context-window packing)")
    pck.add_argument("inputs", nargs="+")
    pck.add_argument("-o", "--out", required=True)
    pck.add_argument("--max-tokens", type=int, default=512)
    pck.add_argument("--stride", type=int, default=None,
                     help="window start step; default max-tokens"
                          " (non-overlapping)")
    pck.add_argument("--id-col", default="doc_id")
    pck.add_argument("--text-col", default="text")
    pck.add_argument("--num-cpus", type=int, default=None)
    pck.set_defaults(fn=cmd_chunk)

    ppk = sub.add_parser("pack",
                         help="pack sequences into fixed-token-budget"
                              " training rows (chunk's downstream step)")
    ppk.add_argument("inputs", nargs="+")
    ppk.add_argument("-o", "--out", required=True)
    ppk.add_argument("--budget", type=int, default=2048)
    ppk.add_argument("--mode", choices=("next_fit", "stream"),
                     default="next_fit",
                     help="next_fit keeps sequences whole; stream cuts the"
                          " concatenated token stream at exact boundaries")
    ppk.add_argument("--n-buckets", type=int, default=64)
    ppk.add_argument("--id-col", default="doc_id")
    ppk.add_argument("--order-cols", nargs="*", default=[],
                     help="secondary sort keys, e.g. chunk_id for chunk"
                          " output")
    ppk.add_argument("--text-col", default="text")
    ppk.add_argument("--n-tokens-col", default=None,
                     help="precomputed token-count column (chunk output"
                          " carries n_tokens); counted per batch when"
                          " absent")
    ppk.add_argument("--num-cpus", type=int, default=None)
    ppk.set_defaults(fn=cmd_pack)

    pb = sub.add_parser("bpe", help="train a BPE vocabulary on corpus word "
                        "frequencies and write per-doc subword counts")
    pb.add_argument("inputs", nargs="+")
    pb.add_argument("-o", "--out", required=True)
    pb.add_argument("--n-merges", type=int, default=1000)
    pb.add_argument("--max-words", type=int, default=100_000,
                    help="train on the top-N word types by frequency")
    pb.add_argument("--min-freq", type=int, default=2)
    pb.add_argument("--merges-in", default=None,
                    help="skip training: re-apply a bpe_merges.json")
    pb.add_argument("--id-col", default="doc_id")
    pb.add_argument("--text-col", default="text")
    pb.add_argument("--num-cpus", type=int, default=None)
    pb.set_defaults(fn=cmd_bpe)

    pg = sub.add_parser("gen", help="synthesize the FIXTURES webtable")
    pg.add_argument("-o", "--out", required=True)
    pg.add_argument("--rows", type=int, default=50_000)
    pg.add_argument("--shard-rows", type=int, default=25_000)
    pg.set_defaults(fn=cmd_gen)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
