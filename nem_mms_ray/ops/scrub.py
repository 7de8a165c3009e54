"""PII scrubbing: redact emails / IPs / SSNs / phones / long card-style
digit runs from a text column, fully vectorized.

A standard web-corpus hygiene stage before training.  The whole pass is
column-level Arrow RE2 (`pc.replace_substring_regex` /
`pc.count_substring_regex`) — no Python loop touches a row, patterns are
applied in a fixed order so later patterns see earlier replacements (the
same left-to-right contract as a sequential `re.sub` chain, which the
parity tests mirror with `re.ASCII`; RE2 character classes like ``\\d``
are ASCII-only by default, and that is the documented semantics here).

Ray shape: a pure `map_batches` stage — zero shuffles, text streams
through once.  RE2 compiles per call inside Arrow's kernel cache; there
is no per-actor state to host, so task mode (warm-worker reuse) is the
right default, same as the curate gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2/re-compatible pattern, replacement) — applied IN ORDER.
# email first (its local part can contain digits a later pattern would
# chew), dotted quads before phones (phone separators include '.'),
# SSN before phone (3-2-4 vs 3-3-4 digit grouping is disjoint, but the
# order makes the intent explicit), bare 13-16 digit runs last.
DEFAULT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone",
     r"\+?\b(?:\d{1,2}[ .-])?\d{3}[ .-]\d{3}[ .-]\d{4}\b"
     r"|\(\d{3}\)[ .-]?\d{3}[ .-]\d{4}\b",
     "<PHONE>"),
    ("card", r"\b\d{13,16}\b", "<NUMBER>"),
)


def scrub_batch(t: pa.Table, text_col: str = "text",
                patterns=DEFAULT_PATTERNS,
                with_counts: bool = False) -> pa.Table:
    """Redact `text_col` in place; `with_counts` appends one int64
    `pii_<name>` column per pattern with that row's match count
    (counted against the text as each pattern sees it, i.e. after the
    patterns before it have replaced)."""
    col = pc.fill_null(t.column(text_col), "")
    counts = {}
    for name, pat, repl in patterns:
        if with_counts:
            counts[f"pii_{name}"] = pc.count_substring_regex(col, pat)
        col = pc.replace_substring_regex(col, pat, repl)
    out = t.set_column(t.schema.get_field_index(text_col), text_col, col)
    for cname, carr in counts.items():
        out = out.append_column(cname, carr.cast(pa.int64()))
    return out


def scrub_text(ds, text_col: str = "text", patterns=DEFAULT_PATTERNS,
               with_counts: bool = False):
    """Dataset with `text_col` scrubbed (schema otherwise unchanged;
    `with_counts` adds pii_<name> int64 columns)."""
    import functools

    return ds.map_batches(
        functools.partial(scrub_batch, text_col=text_col,
                          patterns=patterns, with_counts=with_counts),
        batch_format="pyarrow")


def scrub_stats(ds, text_col: str = "text",
                patterns=DEFAULT_PATTERNS) -> dict:
    """Corpus-level redaction counts: {pattern name: total matches}.
    Distributed sum over the per-row counts — nothing row-sized reaches
    the driver."""
    counted = scrub_text(ds, text_col, patterns, with_counts=True)
    names = [f"pii_{name}" for name, _, _ in patterns]

    def partial_sums(t: pa.Table) -> pa.Table:
        return pa.table({n: pa.array(
            [int(pc.sum(t.column(n)).as_py() or 0)], pa.int64())
            for n in names})

    agg = counted.map_batches(partial_sums, batch_format="pyarrow")
    return {n[len("pii_"):]: int(agg.sum(n) or 0) for n in names}
