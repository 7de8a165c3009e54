"""Relational operators over the testdata tables — the engine's breadth
surface (groupby/aggregate with pre-aggregation, broadcast join, top-k,
time bucketing), each SQL-mirrorable for the DuckDB oracle.

Scale notes: every groupby here pre-aggregates inside map_batches first
(partial combiner), so the shuffle moves one row per key per batch instead
of the raw table (ray_guide 'Aggregation at scale').
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

logger = logging.getLogger(__name__)

# Window-shape ops (sessionize, sliding) hold one hash-bucket of users per
# task; a single pathological user (bot traffic) cannot be split across
# tasks, so its rows bound that task's memory.  Above this count we log an
# explicit skew report instead of failing silently (no-silent-caps rule);
# no rows are dropped.
MAX_USER_ROWS = 2_000_000


def _warn_skewed_users(g: pd.DataFrame, what: str) -> None:
    if len(g) <= MAX_USER_ROWS:
        return
    vc = g["user_id"].value_counts()
    big = vc[vc > MAX_USER_ROWS]
    if len(big):
        logger.warning(
            "%s: %d user(s) exceed %d rows (max %d) — window state for each "
            "is a single in-task group; consider filtering bot users upstream",
            what, len(big), MAX_USER_ROWS, int(big.iloc[0]))


def pricing_summary(ds):
    """TPC-H Q1-flavor: per (l_returnflag, l_linestatus): sum_qty, sum_price,
    avg_disc, n — with per-batch partial aggregation before the shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner: no pandas round-trip per batch (r1 item 10)
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("l_quantity", "sum"), ("l_extendedprice", "sum"),
            ("l_discount", "sum"), ([], "count_all"),
        ])
        return g.select(["l_returnflag", "l_linestatus", "l_quantity_sum",
                         "l_extendedprice_sum", "l_discount_sum", "count_all"]
                        ).rename_columns(["l_returnflag", "l_linestatus",
                                          "sum_qty", "sum_price", "sum_disc", "n"])

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
    codes, seg_names = pd.factorize(cust["c_mktsegment"])
    keys = cust["c_custkey"].to_numpy(np.int64)
    order = np.argsort(keys)
    # broadcast a sorted-key array + code array: per-batch lookups are one
    # vectorized searchsorted, not a Python dict probe per row
    ref = ray.put((keys[order], codes[order].astype(np.int32),
                   np.asarray(seg_names, dtype=object)))

    class JoinSegment:
        def __init__(self):
            self.keys, self.codes, self.names = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = np.asarray(batch.column("o_custkey"), np.int64)
            pos = np.clip(np.searchsorted(self.keys, k), 0, len(self.keys) - 1)
            hit = self.keys[pos] == k
            price = np.asarray(batch.column("o_totalprice"), np.float64)
            # partial combiner: one row per segment leaves the batch
            sums = np.bincount(self.codes[pos][hit], weights=price[hit],
                               minlength=len(self.names))
            return pa.table({
                "c_mktsegment": pa.array(self.names.tolist(), pa.string()),
                "rev_p": pa.array(sums, pa.float64()),
            })

    joined = orders_ds.map_batches(JoinSegment, batch_format="pyarrow",
                                   concurrency=2, num_cpus=1)
    agg = joined.groupby("c_mktsegment").aggregate(
        Sum("rev_p", alias_name="revenue")
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
        g = batch.group_by("user_id").aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "n"])

    agg = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"))
    )

    def local_topk(t: pa.Table) -> pa.Table:
        # global top-k ⊆ union of per-block top-k: the driver merge sees at
        # most n_blocks*k rows, never the full per-user aggregate
        df = t.to_pandas().sort_values(["n", "user_id"],
                                       ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = agg.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    df = cand.sort_values(["n", "user_id"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def events_per_user_hour(events_ds):
    """Tumbling 1h window counts per user — the batch analog of a streaming
    window (ray_guide 'Streaming-shaped workloads'); SQL: date_trunc."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.append_column(
            "hour", pc.floor_temporal(batch.column("ts"), unit="hour"))
        g = t.group_by(["user_id", "hour"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "hour", "n"])

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
        _warn_skewed_users(g, "sessionize_events")
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
        _warn_skewed_users(g, "events_sliding_avg")
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
        g = batch.group_by("event_type").aggregate([
            ([], "count_all"), ("value", "sum"),
            ("value", "min"), ("value", "max"),
        ])
        return g.rename_columns(
            ["event_type", "n", "sum_value", "min_value", "max_value"])

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
        keys = np.asarray(batch.column("c_nationkey"), np.int64)
        uk, cnt = np.unique(keys, return_counts=True)  # dict probes per
        names = [lookup.get(int(k)) for k in uk]       # unique key, not row
        return pa.table({"n_name": pa.array(names, pa.string()),
                         "n": pa.array(cnt, pa.int64())})

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


def exact_value_quantiles(ds, col: str = "value", qs: tuple = (0.25, 0.5, 0.75),
                          id_col: str = "event_id"):
    """Exact order-statistic quantiles via a DISTRIBUTED sort (the one
    all-to-all Ray Data wide op the engine didn't otherwise exercise):
    quantile q = the value at zero-based rank floor(q*(n-1)) of the sorted
    column.  The sorted dataset materializes once in the object store;
    each quantile then costs one split + a single-row take — the driver
    never sees more than one row per quantile.  SQL mirror: row_number()
    OVER (ORDER BY col) at the same ranks."""
    import pyarrow as pa

    n = ds.count()
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    s = ds.select_columns([col]).sort(col).materialize()
    out_q, out_v = [], []
    for q in qs:
        k = int(np.floor(q * (n - 1)))
        part = s.split_at_indices([k])[1]
        row = part.take(1)[0]
        out_q.append(float(q))
        out_v.append(float(row[col]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})
