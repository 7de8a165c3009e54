"""The composed web flagship: Common-Crawl-style parquet -> extracted
text -> curated corpus -> encoded partitions, end to end.

This is the pipeline the north star describes run as ONE command over the
input contract's table (url, warc_ts, html, text, lang): the html column
is the source of truth, the text column is re-derived by the
deterministic extractor (byte-identical per url across runs and cluster
sizes), curation gates + dedups the extracted text, and the encode
engine compresses the survivors with full lineage/verify support.

Each stage writes parquet before the next starts — deliberate, not
incidental: stage outputs are the CHECKPOINTS that make a 100 TB run
resumable (re-running skips straight to the failed stage; the encode
stage additionally resumes per partition via its own manifest), and they
decouple the stages' very different shapes (extract is an embarrassing
map, curate shuffles ~50 B/doc labels, encode is stateful-per-partition).
A driver that wants one fused stream can compose the library calls
directly; a production deployment points `out_dir` at distributed
storage.

Row identity: doc_id = first 8 little-endian bytes of md5(url), as
int64 — the repo's stable-hash convention (`ops/invindex` shard routing),
reproducible across machines and library versions.  At 10^12 urls the
64-bit birthday collision odds are ~2.6%; a collision merges two urls in
the dedup stage (one doc lost) and is detectable by comparing stage row
counts; callers needing zero-loss identity can pre-assign ids.
"""

from __future__ import annotations

import hashlib
import shutil
import time
from pathlib import Path

import numpy as np
import pyarrow as pa


def _url_ids(urls) -> np.ndarray:
    """Stable int64 id per url (md5-8le, the ops/invindex scheme)."""
    out = np.empty(len(urls), np.uint64)
    for i, u in enumerate(urls):
        out[i] = int.from_bytes(
            hashlib.md5((u or "").encode()).digest()[:8], "little")
    return out.view(np.int64)


def web_pipeline(input_paths, out_dir, quality_min: float = 0.0,
                 lang: str | None = None, near_dedup: bool = False,
                 threshold: float = 1.0, target_bytes: int = 64 << 20,
                 verify: bool = False, resume: bool = True) -> dict:
    """Run extract -> curate -> encode over a web table; returns a
    summary dict with per-stage rows, seconds, and the encode ratio.

    `near_dedup` upgrades the curation stage to the full endgame
    (minhash pairs -> connected components -> representative) on top of
    the exact-dedup gate; `verify` re-decodes the encoded output and
    checks it bit-identical (the reference's round-trip contract).
    `resume=True` skips stages whose output parquet already exists —
    stage-level checkpointing on top of encode's per-partition manifest.
    """
    import ray.data as rd

    from nem_mms_ray.ops.curate import (curate_documents_near,
                                        curate_documents_with_text)
    from nem_mms_ray.ops.webextract import extract_text
    from nem_mms_ray.pipelines.encode import encode_files
    from nem_mms_ray.state.manifest import Manifest

    out_dir = Path(out_dir)
    extracted = out_dir / "extracted"
    curated = out_dir / "curated"
    encoded = out_dir / "encoded"
    summary: dict = {"stages": {}}

    # --- stage 1: extract (pure map; url/warc_ts pass through) ------------
    t0 = time.monotonic()
    if not (resume and extracted.exists()):
        shutil.rmtree(extracted, ignore_errors=True)

        def add_ids(t: pa.Table) -> pa.Table:
            ids = _url_ids(t.column("url").to_pylist())
            return t.append_column("doc_id", pa.array(ids))

        ext = extract_text(
            rd.read_parquet([str(p) for p in input_paths],
                            columns=["url", "warc_ts", "html"]),
            html_col="html", out_col="text",
        ).map_batches(add_ids, batch_format="pyarrow")
        ext.write_parquet(str(extracted))
    summary["stages"]["extract"] = {
        "sec": round(time.monotonic() - t0, 3),
        "rows": rd.read_parquet(str(extracted)).count(),
    }

    # --- stage 2: curate (gate + dedup [+ near-dedup endgame]) ------------
    t0 = time.monotonic()
    if not (resume and curated.exists()):
        shutil.rmtree(curated, ignore_errors=True)

        def src():
            return rd.read_parquet(str(extracted), columns=["doc_id", "text"])

        if near_dedup:
            cur = curate_documents_near(src, quality_min=quality_min,
                                        lang=lang, threshold=threshold)
        else:
            cur = curate_documents_with_text(src, quality_min=quality_min,
                                             lang=lang)
        cur.write_parquet(str(curated))
    summary["stages"]["curate"] = {
        "sec": round(time.monotonic() - t0, 3),
        "rows": rd.read_parquet(str(curated)).count(),
    }

    # --- stage 3: encode (per-partition plans, manifest, zone maps) -------
    t0 = time.monotonic()
    cur_paths = sorted(str(p) for p in curated.glob("*.parquet"))
    encode_files(cur_paths, encoded, target_bytes=target_bytes).to_pandas()
    msum = Manifest(encoded).summary()
    summary["stages"]["encode"] = {
        "sec": round(time.monotonic() - t0, 3),
        "rows": int(msum["rows"]),
        "orig_bytes": int(msum["orig_bytes"]),
        "encoded_bytes": int(msum["file_bytes"]),
        "ratio": round(float(msum["ratio"]), 4),
    }

    if verify:
        from nem_mms_ray.pipelines.decode import verify_files

        t0 = time.monotonic()
        v = verify_files(cur_paths, encoded,
                         target_bytes=target_bytes).to_pandas()
        summary["stages"]["verify"] = {
            "sec": round(time.monotonic() - t0, 3),
            "ok": bool(v["ok"].all()),
        }
    return summary
