"""Relational operators over the testdata tables — the engine's breadth
surface (groupby/aggregate with pre-aggregation, broadcast join, top-k,
time bucketing), each SQL-mirrorable for the DuckDB oracle.

Scale notes: every groupby here pre-aggregates inside map_batches first
(partial combiner), so the shuffle moves one row per key per batch instead
of the raw table (ray_guide 'Aggregation at scale').
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pricing_summary(ds):
    """TPC-H Q1-flavor: per (l_returnflag, l_linestatus): sum_qty, sum_price,
    avg_disc, n — with per-batch partial aggregation before the shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_price=("l_extendedprice", "sum"),
            sum_disc=("l_discount", "sum"),
            n=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price", alias_name="sum_price"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("n", alias_name="n"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["avg_disc"] = (df["sum_disc"] / df["n"]).round(6)
        df["sum_qty"] = df["sum_qty"].round(6)
        df["sum_price"] = df["sum_price"].round(4)
        return pa.Table.from_pandas(
            df[["l_returnflag", "l_linestatus", "sum_qty", "sum_price", "avg_disc", "n"]],
            preserve_index=False,
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_by_segment(orders_ds, customers_ds):
    """Broadcast join: customer (small side) shipped once via ray.put, looked
    up per batch — no shuffle join (ray_guide 'Joins and lookups')."""
    import ray
    from ray.data.aggregate import Sum

    cust = customers_ds.select_columns(["c_custkey", "c_mktsegment"]).to_pandas()
    seg_of = dict(zip(cust["c_custkey"].astype(int), cust["c_mktsegment"]))
    ref = ray.put(seg_of)

    class JoinSegment:
        def __init__(self):
            self.seg = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_pylist()
            segs = [self.seg.get(int(k)) for k in keys]
            return pa.table(
                {
                    "c_mktsegment": pa.array(segs),
                    "o_totalprice": batch.column("o_totalprice"),
                }
            )

    joined = orders_ds.map_batches(JoinSegment, batch_format="pyarrow",
                                   concurrency=2, num_cpus=1)
    agg = joined.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="revenue")
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df["revenue"].round(4)
        return pa.Table.from_pandas(df, preserve_index=False)

    return agg.map_batches(finish, batch_format="pyarrow")


def top_users_by_events(events_ds, k: int = 10):
    """Count events per user (pre-aggregated), top-k by (count desc, id asc)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("user_id", as_index=False).agg(n=("event_id", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"))
    )
    # top-k: a tiny result; sort on the aggregated (small) dataset
    df = agg.to_pandas().sort_values(["n", "user_id"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def events_per_user_hour(events_ds):
    """Tumbling 1h window counts per user — the batch analog of a streaming
    window (ray_guide 'Streaming-shaped workloads'); SQL: date_trunc."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        g = df.groupby(["user_id", "hour"], as_index=False).agg(n=("event_id", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Sum("n", alias_name="n"))
    )


def filter_orders_by_priority(orders_ds, priority: str):
    """Vectorized predicate filter inside map_batches (faster than row filter)."""
    import pyarrow.compute as pc

    return orders_ds.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], priority)),
        batch_format="pyarrow",
    )
