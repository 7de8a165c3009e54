"""The flagship encode pipeline: Parquet in -> encoded partitions + manifest.

Ray-Data-native shape (SURVEY.md §3.1 target lifecycle):

    driver: plan_partitions(...)            # metadata only, deterministic ids
    ray.data.from_items(specs)              # Dataset of partition specs
      .map_batches(EncodePartitions,        # actor pool, batch = one spec
                   concurrency=N, num_cpus=1)
    -> Dataset of per-partition metric rows # consumed small

Each actor task streams its partition through pyarrow record batches
(bounded memory), runs the sampling pass (sketches -> codec plan, FSST
symbol tables trained ONCE per partition and reused across batches — the
stateful-stage contract from BASELINE.json:north_star), encodes column
chunks, and writes one encoded parquet file + one manifest lineage record
atomically.  Encode is deliberately shuffle-free: partition independence is
the design (SURVEY.md §7.3).

This mirrors the reference's parse lifecycle (expand -> classify -> segment
-> pivot -> route -> write, /root/reference/src/main.rs:92-100,
/root/reference/src/packages/mod.rs:196-237) with Ray Data supplying the
parallelism the reference lacks (single-threaded, fully materialized —
/root/reference/src/packages/mod.rs:197-218).
"""

from __future__ import annotations

import math
import os
import tempfile
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from nem_mms_ray import dtypes
from nem_mms_ray.codecs import EncodedColumn, get_codec
from nem_mms_ray.selector import plan_for_sketches
from nem_mms_ray.state.manifest import Manifest, PartitionRecord
from nem_mms_ray.stats import sketch_array

DEFAULT_TARGET_BYTES = 128 << 20
SAMPLE_ROWS = 4096

ENCODED_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("chunk_idx", pa.int32()),
        ("first_row", pa.int64()),
        ("codec", pa.string()),
        ("n", pa.int64()),
        ("dtype", pa.string()),
        ("params", pa.string()),
        ("payload", pa.large_binary()),
        ("validity", pa.binary()),
        ("has_validity", pa.bool_()),
    ]
)


@dataclass
class PartitionSpec:
    """Unit of codec decision, output and resume.  Ids derive from sorted
    input paths + row-group order — stable across runs and parallelism."""

    pid: int
    path: str
    row_groups: list[int]
    approx_bytes: int
    rows: int

    def to_row(self) -> dict:
        return {
            "pid": self.pid,
            "path": self.path,
            "row_groups": self.row_groups,
            "approx_bytes": self.approx_bytes,
            "rows": self.rows,
        }


def plan_partitions(
    paths: list[str | Path],
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> list[PartitionSpec]:
    """Driver-side, metadata-only partition planning with skew handling.

    Row groups pack greedily up to target_bytes (uncompressed arrow-side
    estimate from parquet metadata); an oversized row group becomes its own
    partition (the size-based re-split of SURVEY.md §7.1.6 — giant html/text
    blobs cannot straddle a partition and blow an actor's heap).
    """
    if not paths:
        raise ValueError("plan_partitions: no input paths given")
    sorted_paths = sorted({str(p) for p in paths})  # dedupe: double-listed
    # inputs must not double-encode (and double-count) a file
    metas = _row_group_metas(sorted_paths)
    specs: list[PartitionSpec] = []
    pid = 0
    for path in sorted_paths:
        rg_meta = metas[path]
        cur_rgs: list[int] = []
        cur_bytes = 0
        cur_rows = 0

        def flush():
            nonlocal pid, cur_rgs, cur_bytes, cur_rows
            if cur_rgs:
                specs.append(PartitionSpec(pid, path, cur_rgs, cur_bytes, cur_rows))
                pid += 1
                cur_rgs, cur_bytes, cur_rows = [], 0, 0

        for rg, (sz, nrows) in enumerate(rg_meta):
            if sz >= target_bytes:  # oversized row group -> isolated partition
                flush()
                specs.append(PartitionSpec(pid, path, [rg], sz, nrows))
                pid += 1
                continue
            if cur_bytes + sz > target_bytes:
                flush()
            cur_rgs.append(rg)
            cur_bytes += sz
            cur_rows += nrows
        flush()
    return specs


def _read_rg_meta(path: str) -> list[tuple[int, int]]:
    md = pq.ParquetFile(path).metadata
    return [
        (md.row_group(rg).total_byte_size, md.row_group(rg).num_rows)
        for rg in range(md.num_row_groups)
    ]


def _row_group_metas(sorted_paths: list[str]) -> dict[str, list[tuple[int, int]]]:
    """Per-file row-group (bytes, rows) metadata.

    Fans the footer reads out as Ray tasks when the listing is large — a
    serial driver-side scan is fine for dozens of files but becomes the
    bottleneck at web scale (1e5-1e6 fragments x ~5ms per footer).  Output
    is keyed by path, so partition ids stay derived from sorted paths +
    row-group order regardless of task completion order (resume contract,
    SURVEY.md §7.4)."""
    if len(sorted_paths) < 32:
        return {p: _read_rg_meta(p) for p in sorted_paths}
    import ray

    if not ray.is_initialized():
        return {p: _read_rg_meta(p) for p in sorted_paths}
    fetch = ray.remote(num_cpus=0.25)(_read_rg_meta)
    refs = [fetch.remote(p) for p in sorted_paths]
    return dict(zip(sorted_paths, ray.get(refs)))


def _rows_per_batch(approx_bytes: int, rows: int, target: int = 32 << 20) -> int:
    avg = max(1, approx_bytes // max(1, rows))
    return int(np.clip(target // avg, 64, 65536))


@dataclass
class PartitionResult:
    pid: int
    rows: int = 0
    orig_bytes: int = 0
    encoded_bytes: int = 0
    wall_sec: float = 0.0
    skipped: bool = False
    codecs: dict = field(default_factory=dict)


def _attach_zone_map(ec, arr: pa.Array) -> None:
    """Stamp per-chunk min/max (zone map) into the codec params for
    orderable types: `scan_encoded` prunes chunks whose range is disjoint
    from a predicate WITHOUT decoding any of their payloads.  Temporal
    types store raw epoch ints; non-finite float bounds are skipped
    (NaN-poisoned zones must not prune)."""
    import pyarrow.compute as pc

    t = arr.type
    try:
        if pa.types.is_integer(t):
            mm = pc.min_max(arr)
            if mm["min"].is_valid:
                ec.params["zmin"] = int(mm["min"].as_py())
                ec.params["zmax"] = int(mm["max"].as_py())
        elif pa.types.is_floating(t):
            mm = pc.min_max(arr)
            if mm["min"].is_valid:
                lo, hi = float(mm["min"].as_py()), float(mm["max"].as_py())
                if math.isfinite(lo) and math.isfinite(hi):
                    ec.params["zmin"] = lo
                    ec.params["zmax"] = hi
        elif (pa.types.is_timestamp(t) or pa.types.is_date(t)
              or pa.types.is_time(t)):
            mm = pc.min_max(arr)
            if mm["min"].is_valid:
                ec.params["zmin"] = int(mm["min"].value)
                ec.params["zmax"] = int(mm["max"].value)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            # string zones (url-range scans over url-sorted corpora): long
            # values store a BOUND, not the value — prefix(min) is a valid
            # lower bound, and the prefix-successor of max (last code point
            # incremented) upper-bounds every value sharing that prefix.
            # UTF-8 byte order == code-point order, so Python/Arrow/JSON
            # comparisons all agree.
            mm = pc.min_max(arr)
            if mm["min"].is_valid:
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                zmax_v = hi if len(hi) <= 64 else _string_successor(hi[:64])
                if zmax_v or hi == "":  # successor '' = no valid upper bound
                    ec.params["zmin"] = lo[:64]
                    ec.params["zmax"] = zmax_v
    except Exception:
        pass  # zone maps are an optimization; never fail an encode for one


def _string_successor(p: str) -> str:
    """Smallest string greater than every string with prefix `p` (last
    code point incremented, carrying; '' if p is all U+10FFFF)."""
    cs = list(p)
    while cs:
        o = ord(cs[-1])
        if o < 0x10FFFF:
            cs[-1] = chr(o + 1)
            return "".join(cs)
        cs.pop()
    return ""


class EncodePartitions:
    """Actor-pool callable over partition-spec rows (batch_format='pyarrow').

    State held per actor: output dir + manifest handle; state held per
    partition: codec plan + trained FSST symbol tables (built on the
    sampling pass, reused for every batch of that partition).
    """

    def __init__(self, out_dir: str, columns: list[str] | None = None,
                 sample_rows: int = SAMPLE_ROWS):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.columns = columns
        self.sample_rows = sample_rows
        self.manifest = Manifest(out_dir)
        self.manifest.init()

    # -- sampling pass ------------------------------------------------------
    def _plan(self, pf: pq.ParquetFile, row_groups: list[int]):
        """Sketch + train on the partition's first rows, ONCE per column.

        String columns train their real FSST symbol table here and measure
        the realized ratio on the training sample — one training pass feeds
        both the selector (via sketch.fsst_ratio) and the encode stage (the
        table is reused for every batch of the partition), instead of a
        throwaway probe table plus a second real training.  Sketches use a
        2048-row slice: plan decisions are ratio-based and stable well below
        the full sample, and KMV-hashing multi-MB html slices dominated the
        plan cost otherwise (profiled: 0.59s -> ~0.2s per partition).
        """
        from nem_mms_ray.codecs import _fsst_native as _native
        from nem_mms_ray.codecs.fsst import _string_buffers, take_sample, train_symbols

        from nem_mms_ray.selector import ColumnPlan

        try:
            first = next(pf.iter_batches(batch_size=self.sample_rows,
                                         row_groups=row_groups[:1],
                                         columns=self.columns))
            sample = pa.Table.from_batches([first])
        except StopIteration:  # zero-row partition: plan from empty columns
            sample = pf.schema_arrow.empty_table()
            if self.columns:
                sample = sample.select(list(self.columns))
        sketches = {}
        trained = {}
        ipc_cols = []
        for name in sample.column_names:
            arr = sample.column(name).combine_chunks()
            try:
                sk = sketch_array(name, arr.slice(0, min(len(arr), 2048)),
                                  with_fsst_probe=False)
            except Exception:
                # un-sketchable type (list/struct/map/...): store via the
                # universal Arrow-IPC fallback instead of aborting the run
                ipc_cols.append(name)
                continue
            # train even on small columns (cheap): prefix-heavy short string
            # columns (ids, names) compress well and the measured ratio beats
            # the blind 0.6 default in the fsst estimate
            if dtypes.is_string_like(arr.type) and sk.value_bytes >= 512:
                # buffer-extract only ~4x the training cap, not the whole
                # multi-MB sample column (tobytes on it dominated the plan)
                from nem_mms_ray.codecs.fsst import TRAIN_SAMPLE_BYTES

                avg = max(1, sk.value_bytes // max(1, sk.n - sk.nulls))
                need = min(len(arr), max(256, (4 * TRAIN_SAMPLE_BYTES) // avg))
                idx = np.linspace(0, len(arr) - 1, need).astype(np.int64)
                _, data = _string_buffers(dtypes.fill_nulls(arr.take(idx)))
                if len(data):
                    s = take_sample(bytes(data))
                    syms = train_symbols(s)
                    trained[name] = syms
                    sk.fsst_ratio = len(_native.encode(*syms, s)) / max(1, len(s))
            sketches[name] = sk
        plans = plan_for_sketches(sketches)
        for name in ipc_cols:
            plans[name] = ColumnPlan(column=name, codec="ipc")
        symbols = {n: t for n, t in trained.items() if plans[n].codec == "fsst"}
        return plans, symbols

    def _encode_chunk(self, name: str, arr: pa.Array, plans, symbols) -> EncodedColumn:
        """Codec dispatch + never-expand guard + zone-map stamp."""
        codec_name = plans[name].codec
        codec = get_codec(codec_name)
        try:
            if codec_name == "fsst" and name in symbols:
                ec = codec.encode(arr, symbols=symbols[name])
            else:
                ec = codec.encode(arr)
        except Exception:
            # robustness split per the reference (unknown/undecodable unit ->
            # skip+record, /root/reference/src/packages/mod.rs:201-216):
            # fall back to plain, or to the universal IPC codec if even
            # plain can't represent the type; record the event either way.
            try:
                ec = get_codec("plain").encode(arr)
            except Exception:
                ec = get_codec("ipc").encode(arr)
            ec.params["fallback_from"] = codec_name
            return ec
        # never-expand guard: a sketch-misjudged codec (e.g. RLE on
        # all-distinct short strings from a tiny sample) must not store more
        # bytes than plain would — compare against the exact plain encoding
        # when the chosen one isn't clearly smaller
        if codec_name not in ("plain", "ipc") and ec.encoded_bytes > 0.9 * arr.nbytes:
            pe = get_codec("plain").encode(arr)
            if pe.encoded_bytes < ec.encoded_bytes:
                pe.params["fallback_from"] = codec_name
                ec = pe
        _attach_zone_map(ec, arr)
        return ec

    def _encode_partition(self, spec: PartitionSpec) -> PartitionResult:
        t0 = time.monotonic()
        # re-create defensively: cached worker-level instances may outlive an
        # out_dir that the driver removed between runs
        self.out_dir.mkdir(parents=True, exist_ok=True)
        out_path = self.out_dir / f"part-{spec.pid:06d}.parquet"
        if self.manifest.is_done(spec.pid, spec.path, spec.row_groups):
            return PartitionResult(pid=spec.pid, skipped=True)

        pf = pq.ParquetFile(spec.path)
        plans, symbols = self._plan(pf, spec.row_groups)

        col_bytes: dict[str, list[int]] = {}
        rows = 0
        orig_bytes = 0
        enc_bytes = 0
        fd, tmp = tempfile.mkstemp(dir=self.out_dir, suffix=".tmp")
        os.close(fd)
        try:
            # zstd entropy layer over the codec payloads: FSST/bitpack output
            # keeps a skewed, repetitive byte distribution that zstd cuts
            # hard, at a faster write than snappy (measured on a 64MiB
            # webtable partition: snappy 9.6MB/79ms; zstd-1 3.9MB/49ms;
            # zstd-3 1.2MB/56ms) — level 3 is the ratio/speed knee
            writer = pq.ParquetWriter(tmp, ENCODED_SCHEMA, compression="zstd",
                                      compression_level=3)
            bpr = _rows_per_batch(spec.approx_bytes, spec.rows)
            for chunk_idx, rb in enumerate(
                pf.iter_batches(batch_size=bpr, row_groups=spec.row_groups,
                                columns=self.columns)
            ):
                out_rows = []
                for name, arr in zip(rb.schema.names, rb.columns):
                    ec = self._encode_chunk(name, arr, plans, symbols)
                    r = ec.to_row()
                    r["column"] = name
                    r["chunk_idx"] = chunk_idx
                    r["first_row"] = rows
                    out_rows.append(r)
                    cb = col_bytes.setdefault(name, [0, 0])
                    cb[0] += arr.nbytes
                    cb[1] += ec.encoded_bytes
                    orig_bytes += arr.nbytes
                    enc_bytes += ec.encoded_bytes
                rows += rb.num_rows
                writer.write_table(pa.Table.from_pylist(out_rows, schema=ENCODED_SCHEMA))
            writer.close()
            os.replace(tmp, out_path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

        wall = time.monotonic() - t0
        self.manifest.write(
            PartitionRecord(
                pid=spec.pid,
                input_file=spec.path,
                row_groups=list(spec.row_groups),
                rows=rows,
                orig_bytes=orig_bytes,
                encoded_bytes=enc_bytes,
                file_bytes=out_path.stat().st_size,
                codecs={c: p.codec for c, p in plans.items()},
                column_bytes=col_bytes,
                wall_sec=wall,
                done=True,
                output_file=str(out_path),
            )
        )
        return PartitionResult(
            pid=spec.pid, rows=rows, orig_bytes=orig_bytes,
            encoded_bytes=enc_bytes, wall_sec=wall,
            codecs={c: p.codec for c, p in plans.items()},
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        results = []
        for row in batch.to_pylist():
            spec = PartitionSpec(
                pid=row["pid"], path=row["path"],
                row_groups=list(row["row_groups"]),
                approx_bytes=row["approx_bytes"], rows=row["rows"],
            )
            res = self._encode_partition(spec)
            results.append(
                {
                    "pid": res.pid,
                    "rows": res.rows,
                    "orig_bytes": res.orig_bytes,
                    "encoded_bytes": res.encoded_bytes,
                    "wall_sec": res.wall_sec,
                    "skipped": res.skipped,
                    "codecs": str(sorted(res.codecs.items())),
                }
            )
        return pa.Table.from_pylist(results)


# Per-worker cache for task-mode encoders: a Ray task wave reuses warm worker
# processes, so the instance (and its imports) amortizes across tasks exactly
# like an actor would — without the actor-pool operator's fixed ramp-up cost
# (measured ~3s per pipeline on this Ray version vs ~0.1s for task pools).
_WORKER_STAGES: dict = {}


def _encode_task(batch: pa.Table, *, out_dir: str, columns_key: tuple | None) -> pa.Table:
    key = ("enc", out_dir, columns_key)
    stage = _WORKER_STAGES.get(key)
    if stage is None:
        stage = EncodePartitions(out_dir, list(columns_key) if columns_key else None)
        _WORKER_STAGES[key] = stage
    return stage(batch)


def encode_files(
    input_paths: list[str | Path],
    out_dir: str | Path,
    columns: list[str] | None = None,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    concurrency: int | tuple[int, int] | None = None,
    use_actors: bool = False,
):
    """Build the encode pipeline; returns a lazy Dataset of metric rows.

    Consume with .to_pandas()/.take_all() (tiny: one row per partition) —
    the heavy data streams worker-side only.

    `use_actors=True` runs the stage as an explicit actor pool; the default
    task mode keeps identical per-partition-state semantics (plan + FSST
    tables built once per partition inside the task) while letting Ray's
    warm worker processes amortize imports — better for short jobs and for
    elasticity; actor pools win when an actor carries cross-partition state.
    """
    import functools

    import ray.data as rd

    specs = plan_partitions(input_paths, target_bytes)
    # run-level lineage: refuse resume into an out_dir planned differently
    m = Manifest(out_dir)
    m.check_run_header([str(p) for p in input_paths], target_bytes)
    m.write_run_header([str(p) for p in input_paths], target_bytes, len(specs))
    # one block per spec: from_items packs everything into one block, which
    # would serialize the whole encode behind a single actor task
    ds = rd.from_items([s.to_row() for s in specs], override_num_blocks=len(specs))
    if use_actors:
        import ray

        if concurrency is None:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            concurrency = max(2, min(len(specs), ncpu))
        return ds.map_batches(
            EncodePartitions,
            fn_constructor_kwargs={"out_dir": str(out_dir), "columns": columns},
            batch_size=1,
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )
    fn = functools.partial(
        _encode_task,
        out_dir=str(out_dir),
        columns_key=tuple(columns) if columns else None,
    )
    return ds.map_batches(fn, batch_size=1, batch_format="pyarrow", num_cpus=1)
