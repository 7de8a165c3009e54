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


def events_running_seq(events_ds):
    """Per-user running sequence number ordered by (ts, event_id) — the
    partitioned window-function shape (SQL: row_number() OVER).  Groups fit
    in memory per user; the shuffle key is user_id."""
    def seq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        g["seq"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["user_id", "event_id", "seq"]]

    return events_ds.groupby("user_id").map_groups(seq, batch_format="pandas")


def sessionize_events(events_ds, gap_minutes: int = 30, n_buckets: int = 64):
    """Gap-based session windows per user (the session-window shape Ray Data
    lacks natively): a new session starts when the time since the user's
    previous event exceeds `gap_minutes`.  Returns Dataset[(user_id,
    session_id, session_start, session_end, n_events)].

    Scale shape: shuffle on a user-hash bucket (bounded group count — see
    the minhash coarse-bucket note), then a vectorized pandas groupby per
    bucket; every user's events land in one bucket so intra-user order is
    total after the in-group sort by (ts, event_id)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("user_id"), dtype=np.int64)
        return t.append_column("bucket", pa.array((u % n_buckets).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        t = g["ts"].astype("int64")  # epoch micros
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = (t.diff() > gap_us) | new_user
        # session_id restarts at 0 per user: cumsum of breaks minus the
        # cumulative break count at each user's first row
        sid_all = brk.cumsum()
        first_of_user = sid_all.where(new_user).ffill()
        g["session_id"] = (sid_all - first_of_user).astype(np.int64)
        out = (
            g.groupby(["user_id", "session_id"], sort=True)
            .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                 n_events=("ts", "size"))
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return (
        events_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def events_sliding_avg(events_ds, window: int = 3, n_buckets: int = 64):
    """Per-user sliding mean of `value` over the last `window` rows ordered
    by (ts, event_id) — the ROWS-frame window-aggregate shape.  Returns
    Dataset[(user_id, event_id, sliding_avg)]."""
    def add_bucket(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("user_id"), dtype=np.int64)
        return t.append_column("bucket", pa.array((u % n_buckets).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        avg = (
            g.groupby("user_id", sort=False)["value"]
            .rolling(window, min_periods=1).mean()
            .reset_index(level=0, drop=True)
        )
        return pd.DataFrame({
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "sliding_avg": np.round(avg, 6),
        })

    return (
        events_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def event_type_value_stats(events_ds):
    """Per event_type: n, sum/min/max of value (pre-aggregated partials)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("event_type", as_index=False).agg(
            n=("event_id", "size"), sum_value=("value", "sum"),
            min_value=("value", "min"), max_value=("value", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_value", alias_name="sum_value"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        for c in ("sum_value", "min_value", "max_value"):
            df[c] = df[c].round(4)
        return pa.Table.from_pandas(df, preserve_index=False)

    return agg.map_batches(finish, batch_format="pyarrow")


def customers_per_nation(customers_ds, nation_ds):
    """Broadcast dimension join (nation is tiny) -> counts per nation name."""
    import ray
    from ray.data.aggregate import Sum

    nat = nation_ds.to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    ref = ray.put(name_of)

    def join_count(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        names = [lookup.get(int(k)) for k in batch.column("c_nationkey").to_pylist()]
        g = pd.Series(names).value_counts().rename_axis("n_name").reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        customers_ds.map_batches(join_count, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("n", alias_name="n_customers"))
    )


def lineitem_revenue(lineitem_ds, before: str = "1996-01-01"):
    """Vectorized filter + computed column: per-row revenue before a date."""
    import pyarrow.compute as pc

    cutoff = pa.scalar(np.datetime64(before, "us"), type=pa.timestamp("us"))

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], cutoff))
        raw = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        # floor(x*1e4+0.5)/1e4 == DuckDB round-half-away for positive values;
        # identical double ops on both sides -> bit-identical results
        v = np.asarray(raw)
        rev = pa.array(np.floor(v * 1e4 + 0.5) / 1e4)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "revenue": rev,
        })

    return lineitem_ds.map_batches(fn, batch_format="pyarrow")


def filter_orders_by_priority(orders_ds, priority: str):
    """Vectorized predicate filter inside map_batches (faster than row filter)."""
    import pyarrow.compute as pc

    return orders_ds.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], priority)),
        batch_format="pyarrow",
    )
