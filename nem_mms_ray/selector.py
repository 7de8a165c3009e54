"""Codec auto-selection: sketch -> codec plan.

The single dispatch site replacing the reference's five hand-maintained ones
(SURVEY.md §2.7): every registered codec scores itself via `estimate(sketch)`
and the cheapest wins, with a deterministic tie-break on codec name so the
plan is identical across parallelism levels.

Expected outcomes per BASELINE.json:north_star — low-cardinality `lang` →
dict(+bitpack); `warc_ts` → for(+bitpack); `url`/`text` → fsst with dict
fallback at low ndv.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from nem_mms_ray import dtypes
from nem_mms_ray.codecs import REGISTRY
from nem_mms_ray.stats import ColumnSketch


@dataclass
class ColumnPlan:
    column: str
    codec: str
    estimates: dict[str, float] = field(default_factory=dict)

    def to_row(self) -> dict:
        return {
            "column": self.column,
            "codec": self.codec,
            "estimates": {k: float(v) for k, v in self.estimates.items()},
        }


def select_codec(sketch: ColumnSketch) -> ColumnPlan:
    typ = dtypes.type_from_str(sketch.dtype)
    estimates: dict[str, float] = {}
    for name in sorted(REGISTRY):
        codec = REGISTRY[name]
        if not codec.can_encode(typ):
            continue
        est = codec.estimate(sketch)
        if est != float("inf"):
            estimates[name] = float(est)
    # deterministic: smallest estimate, ties broken lexicographically
    best = min(estimates.items(), key=lambda kv: (kv[1], kv[0]))[0]
    return ColumnPlan(column=sketch.column, codec=best, estimates=estimates)


def plan_for_sketches(sketches: dict[str, ColumnSketch]) -> dict[str, ColumnPlan]:
    return {c: select_codec(sk) for c, sk in sketches.items()}


def plan_for_table(table: pa.Table, columns: list[str] | None = None) -> dict[str, ColumnPlan]:
    from nem_mms_ray.stats import sketch_table

    return plan_for_sketches(sketch_table(table, columns))
