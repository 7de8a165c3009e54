"""Composable row-Dataset encode/decode stages.

`encode_dataset` turns ANY ray.data.Dataset into a Dataset of encoded-chunk
rows via map_batches (per-batch codec plan unless a fixed plan is given);
`decode_dataset` inverts it.  This is the generic building block — the
file-partition pipeline (pipelines/encode.py) remains the flagship because
it owns partition identity, per-partition symbol-table reuse, manifest and
resume; use these stages when the input is already a Dataset (e.g. the
output of other ops) or when composing encode into a larger pipeline.
"""

from __future__ import annotations

import pyarrow as pa

from nem_mms_ray.codecs import EncodedColumn, decode_column, get_codec
from nem_mms_ray.selector import plan_for_sketches
from nem_mms_ray.stats import sketch_array

ENCODED_ROW_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("codec", pa.string()),
        ("n", pa.int64()),
        ("dtype", pa.string()),
        ("params", pa.string()),
        ("payload", pa.large_binary()),
        ("validity", pa.binary()),
        ("has_validity", pa.bool_()),
    ]
)


class EncodeBatch:
    """Actor-pool stage: one input batch -> one encoded row per column.

    With `plan` fixed (column -> codec name) the stage is deterministic
    across batch boundaries; with plan=None each batch is sketched and
    planned independently (fine for exploration, not for stable output).
    """

    def __init__(self, plan: dict[str, str] | None = None,
                 columns: list[str] | None = None):
        self.plan = plan
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.columns or batch.column_names
        if self.plan is None:
            sketches = {c: sketch_array(c, batch.column(c)) for c in cols}
            plan = {c: p.codec for c, p in plan_for_sketches(sketches).items()}
        else:
            plan = self.plan
        rows = []
        for c in cols:
            arr = batch.column(c)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            ec = get_codec(plan[c]).encode(arr)
            r = ec.to_row()
            r["column"] = c
            rows.append(r)
        return pa.Table.from_pylist(rows, schema=ENCODED_ROW_SCHEMA)


def default_pool_size(want: int = 4) -> int:
    """An actor pool that reserves every CPU starves the upstream read and
    the pipeline deadlocks (observed live on a 4-CPU session with
    concurrency=4); always leave at least one CPU for reads/writes."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", want + 1)) if ray.is_initialized() else want + 1
    return max(1, min(want, cpus - 1))


def encode_dataset(ds, plan: dict[str, str] | None = None,
                   columns: list[str] | None = None,
                   batch_size: int = 16384, concurrency: int | None = None):
    if concurrency is None:
        concurrency = default_pool_size()
    return ds.map_batches(
        EncodeBatch,
        fn_constructor_kwargs={"plan": plan, "columns": columns},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def decode_batch_rows(batch: pa.Table) -> pa.Table:
    """Encoded rows (one whole chunk set per call) -> reassembled table."""
    cols: dict[str, list[pa.Array]] = {}
    for row in batch.to_pylist():
        ec = EncodedColumn.from_row(row)
        cols.setdefault(row["column"], []).append(decode_column(ec))
    return pa.table({c: pa.concat_arrays(arrs) for c, arrs in cols.items()})


def decode_dataset(enc_ds, batch_size: int = 64):
    """Note: correct reassembly requires each batch to contain whole chunk
    groups; with the default EncodeBatch layout (#columns rows per chunk)
    use batch_size = k * n_columns."""
    return enc_ds.map_batches(
        decode_batch_rows, batch_format="pyarrow", batch_size=batch_size
    )
