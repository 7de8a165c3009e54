"""Deterministic synthesis of the Common-Crawl-style webpages table (F1).

Schema per BASELINE.json:input_hint:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Generation is seeded and shard-stable: shard i of an N-row table has
identical bytes regardless of how many shards are generated or in what
order (rng keyed on (seed, shard)), so tests, bench and the correctness
oracle all see the same table — the engine analog of the reference's
fixed inline fixtures (/root/reference/src/flatfile.rs:644-773).

Structure matches FIXTURES.md F1: Zipf hosts (shared URL prefixes → FSST/dict
friendly), clustered near-monotone warc_ts (frame-of-reference friendly),
log-normal html/text lengths with a deterministic fraction of oversized blobs
(skew-detection exercise), ~2% nulls distinct from empty strings, ~30 Zipf
languages.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_LANGS = [
    "en", "zh", "es", "de", "fr", "ja", "ru", "pt", "it", "nl",
    "pl", "tr", "ar", "ko", "vi", "id", "cs", "sv", "fa", "el",
    "ro", "hu", "da", "fi", "th", "uk", "no", "he", "hi", "bg",
]


@dataclass
class WebTableConfig:
    seed: int = 42
    n_domains: int = 1000
    base_ts_us: int = 1_700_000_000_000_000
    step_us: int = 250_000            # crawl advances ~4 rows/sec
    jitter_us: int = 50_000
    html_median: int = 4096           # log-normal median html bytes
    html_sigma: float = 0.6
    null_frac: float = 0.02
    empty_text_frac: float = 0.01
    blob_frac: float = 0.001          # oversized rows
    blob_min: int = 1 << 20           # 1 MiB
    blob_max: int = 8 << 20           # 8 MiB
    text_ratio: float = 0.25          # text length ≈ ratio * html length


SMALL = WebTableConfig(html_median=512, blob_min=64 << 10, blob_max=256 << 10)


def _zipf_probs(k: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, k + 1) ** s
    return w / w.sum()


def _corpus(rng: np.random.Generator, size: int, html: bool) -> bytes:
    """A deterministic boilerplate-heavy corpus buffer; rows slice into it."""
    words = [
        "the", "and", "content", "page", "data", "with", "from", "search",
        "home", "about", "contact", "privacy", "terms", "news", "article",
        "comments", "share", "copyright", "menu", "navigation", "user",
        "product", "service", "online", "click", "more", "información",
        "durchsuchen", "читать", "中文内容", "ページ",
    ]
    tags = ["<div class=\"main\">", "</div>", "<p>", "</p>", "<a href=\"/l/", "\">",
            "</a>", "<span>", "</span>", "<li>", "</li>"]
    parts: list[bytes] = []
    total = 0
    while total < size:
        w = words[int(rng.integers(len(words)))]
        if html and rng.random() < 0.3:
            w = tags[int(rng.integers(len(tags)))]
        b = (w + " ").encode()
        if html and rng.random() < 0.002:
            b += bytes([255, 254, int(rng.integers(256))])  # non-UTF-8 noise
        parts.append(b)
        total += len(b)
    return b"".join(parts)[:size]


def generate_shard(
    shard: int,
    rows: int,
    start_row: int,
    cfg: WebTableConfig = WebTableConfig(),
) -> pa.Table:
    rng = np.random.default_rng([cfg.seed, shard])
    idx = np.arange(start_row, start_row + rows, dtype=np.int64)

    # --- hosts / urls (unique via global row index) ---
    host_ids = rng.choice(cfg.n_domains, size=rows, p=_zipf_probs(cfg.n_domains))
    urls = pa.array(
        [f"https://www.site-{h:04d}.example.org/p/{i // 1000}/{i}" for h, i in zip(host_ids, idx)]
    )

    # --- warc_ts: near-monotone crawl time with small jitter ---
    ts = (
        cfg.base_ts_us
        + idx * cfg.step_us
        + rng.integers(-cfg.jitter_us, cfg.jitter_us, rows)
    )
    warc_ts = pa.array(ts, type=pa.timestamp("us"))

    # --- lang: Zipf over ~30 languages, correlated with host ---
    lang_of_host = np.random.default_rng([cfg.seed, 7]).choice(
        len(_LANGS), size=cfg.n_domains, p=_zipf_probs(len(_LANGS), 1.3)
    )
    langs = pa.array([_LANGS[lang_of_host[h]] for h in host_ids])

    # --- html / text: slices of deterministic corpora, log-normal lengths ---
    html_corpus = _corpus(np.random.default_rng([cfg.seed, 11]), 1 << 20, html=True)
    text_corpus = _corpus(np.random.default_rng([cfg.seed, 13]), 1 << 20, html=False).decode(
        "utf-8", "ignore"
    )
    lens = (cfg.html_median * np.exp(rng.normal(0, cfg.html_sigma, rows))).astype(np.int64)
    lens = np.clip(lens, 64, len(html_corpus) - 1)
    blob_mask = rng.random(rows) < cfg.blob_frac
    blob_lens = rng.integers(cfg.blob_min, cfg.blob_max, rows)
    lens = np.where(blob_mask, blob_lens, lens)
    offs = rng.integers(0, len(html_corpus) - 64, rows)

    null_html = rng.random(rows) < cfg.null_frac
    null_text = rng.random(rows) < cfg.null_frac
    empty_text = rng.random(rows) < cfg.empty_text_frac

    htmls: list[bytes | None] = []
    texts: list[str | None] = []
    tlen_corpus = len(text_corpus)
    for r in range(rows):
        ln = int(lens[r])
        off = int(offs[r])
        if null_html[r]:
            htmls.append(None)
        else:
            reps = (off + ln) // len(html_corpus) + 1
            htmls.append((html_corpus * reps)[off : off + ln])
        if null_text[r]:
            texts.append(None)
        elif empty_text[r]:
            texts.append("")
        else:
            tl = max(16, int(ln * cfg.text_ratio))
            toff = off % max(1, tlen_corpus - 16)
            reps = (toff + tl) // tlen_corpus + 1
            texts.append((text_corpus * reps)[toff : toff + tl])

    return pa.table(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": langs,
        },
        schema=SCHEMA,
    )


def _write_shard(shard: int, n: int, start: int, cfg: WebTableConfig,
                 path: str, row_group_rows: int) -> str:
    t = generate_shard(shard, n, start, cfg)
    tmp = path + ".tmp"
    pq.write_table(t, tmp, row_group_size=row_group_rows)
    Path(tmp).rename(path)
    return path


def write_webtable(
    out_dir: str | Path,
    rows: int,
    shard_rows: int = 25_000,
    cfg: WebTableConfig = WebTableConfig(),
    row_group_rows: int = 4096,
) -> list[Path]:
    """Write the table as shard files web-{i:05d}.parquet; idempotent.

    Shard generation is rng-keyed on (seed, shard) so output is identical
    whether shards are written serially or as parallel Ray tasks (used
    automatically when a Ray session is active).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    todo = []
    paths = []
    shard = 0
    start = 0
    while start < rows:
        n = min(shard_rows, rows - start)
        p = out / f"web-{shard:05d}.parquet"
        paths.append(p)
        if not p.exists():
            todo.append((shard, n, start))
        shard += 1
        start += n

    if todo:
        use_ray = False
        try:
            import ray

            use_ray = ray.is_initialized() and len(todo) > 1
        except ImportError:
            pass
        if use_ray:
            import ray

            fn = ray.remote(num_cpus=1)(_write_shard)
            ray.get([
                fn.remote(s, n, st, cfg, str(out / f"web-{s:05d}.parquet"), row_group_rows)
                for s, n, st in todo
            ])
        else:
            for s, n, st in todo:
                _write_shard(s, n, st, cfg, str(out / f"web-{s:05d}.parquet"), row_group_rows)
    return paths


def main() -> None:
    ap = argparse.ArgumentParser(description="generate the F1 webpages table")
    ap.add_argument("--rows", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shard-rows", type=int, default=25_000)
    ap.add_argument("--small", action="store_true", help="small-blob config for tests")
    args = ap.parse_args()
    cfg = SMALL if args.small else WebTableConfig()
    paths = write_webtable(args.out, args.rows, args.shard_rows, cfg)
    print(f"wrote {len(paths)} shards to {args.out}")


if __name__ == "__main__":
    main()
