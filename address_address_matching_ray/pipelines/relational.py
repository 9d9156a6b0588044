"""Relational / windowed operators over the testdata star schema.

These demonstrate the aggregate / join / sort / top-k / window
capabilities of the engine (SURVEY §2.6-§2.8: A1-A4, K1-K2, J3, D2) with
exact DuckDB SQL oracles.  Patterns:

- pre-aggregate inside ``map_batches`` before the groupby when the key
  space is small (combiner), keep the shuffle tiny
- ``Dataset.join`` for large-large joins; broadcast dict for dim tables
- deterministic top-k = sort on (measure desc, key asc) + limit
- tumbling windows = bucket timestamp in a vectorized map, then groupby
  (events is a finite log; no watermark semantics — SURVEY §2.10)

Column names match the oracle SQL exactly (driver hash-compares).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def read(sf_dir: str, table: str, columns=None):
    """Pruned parquet read with the pandas schema-metadata stripped:
    pandas-written files carry a ``b'pandas'`` metadata dict that makes
    ``hash(pa.Schema)`` raise, which Ray's schema-dedup logs as a
    warning on every block concat/shuffle."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    schema = pq.read_schema(path).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=schema)


def round_cols(ds, cols: dict[str, int]):
    """Round float aggregate columns to fixed decimals — distributed
    summation order injects ~1e-15 relative noise vs a serial oracle;
    both sides round identically so value hashes match."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c, nd in cols.items():
            df[c] = df[c].round(nd)
        return df

    return ds.map_batches(f, batch_format="pandas")


def lineitem_agg(sf_dir: str):
    """TPC-H Q1-shaped aggregate (A1 analog: partial+final for free)."""
    ds = read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev)

    out = (ds.map_batches(revenue, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("revenue", alias_name="sum_revenue"),
                      Mean("l_discount", alias_name="avg_disc"),
                      Count(alias_name="n_rows")))
    out = round_cols(out, {"sum_qty": 2, "sum_revenue": 2, "avg_disc": 8})
    # group cardinality is tiny by definition (flag × status ≤ 6 rows):
    # one block in, one partition out — sorting a 6-row table across N
    # partitions emits N-6 schema-less empty blocks (executor warnings)
    return out.repartition(1).sort(["l_returnflag", "l_linestatus"])


def events_windowed(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + value sum/mean."""
    ds = read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def window(t: pa.Table) -> pd.DataFrame:
        # per-batch combiner: ≤ (types × hours-in-span) partial rows
        # per batch leave the keyer; the bucketed reduce below replaces
        # the native Aggregate, whose per-distinct-key reduce took
        # minutes at 20M events even at this bounded-ish (5 × 2.2k)
        # key count (see join.bucketed_sum)
        import pyarrow.compute as pc
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        hour_us = np.int64(3_600_000_000)
        codes, uniq = pd.factorize(
            t["event_type"].to_numpy(zero_copy_only=False), sort=True)
        key = codes.astype("int64") * np.int64(2**44) + us // hour_us
        u, inv = np.unique(key, return_inverse=True)
        return pd.DataFrame({
            "event_type": uniq[(u // np.int64(2**44)).astype(np.intp)],
            "window_start": (u % np.int64(2**44)) * hour_us,
            "n_events": np.bincount(inv).astype("int64"),
            "sum_value": np.bincount(
                inv, weights=t["value"].to_numpy(zero_copy_only=False))})

    from address_address_matching_ray.pipelines.join import bucketed_sum

    out = bucketed_sum(
        ds.map_batches(window, batch_format="pyarrow", batch_size=500_000),
        ["event_type", "window_start"], ["n_events", "sum_value"],
        bucket_on="window_start")
    out = round_cols(out, {"sum_value": 4})

    def cast_us(t: pa.Table) -> pa.Table:
        # pin the oracle-comparable unit: pandas groupby round-trips can
        # widen to ns, and ns-vs-us string forms hash differently.
        # replace_schema_metadata: an Arrow UDF fed from pandas blocks
        # receives a from_pandas table whose b'pandas' metadata dict is
        # unhashable — downstream shuffles then log a schema-dedup
        # warning per reduce fragment
        import pyarrow.compute as pc
        i = t.column_names.index("window_start")
        return t.set_column(i, "window_start",
                            pc.cast(t["window_start"], pa.timestamp("us"))) \
                .replace_schema_metadata(None)

    return (out.map_batches(cast_us, batch_format="pyarrow")
            .sort(["event_type", "window_start"]))


def top_users(sf_dir: str, k: int = 20, buckets: int = 64):
    """Per-user value sum → deterministic global top-k (K1/K2 analog).

    Bucketed: each user lives wholly in one hash bucket, so per-bucket
    vectorized sums + per-bucket top-k then a tiny global merge is
    exact — ``groupby(user_id)`` would make one Ray group per user
    (unbounded tiny groups at scale)."""
    ds = read(sf_dir, "events", columns=["user_id", "value"])

    def add_b(t: pa.Table) -> pa.Table:
        import numpy as np
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = uid.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        gm = (g.groupby("user_id", sort=False)["value"]
               .agg(["sum", "size"]).reset_index())
        gm.columns = ["user_id", "total_value", "n_events"]
        gm["total_value"] = gm["total_value"].round(4)
        gm["n_events"] = gm["n_events"].astype("int64")
        return (gm.sort_values(["total_value", "user_id"],
                               ascending=[False, True], kind="mergesort")
                  .head(k).reset_index(drop=True))

    agg = (ds.map_batches(add_b, batch_format="pyarrow")
           .groupby("_b").map_groups(
               lambda g: bucket_topk(g.drop(columns=["_b"])),
               batch_format="pandas"))
    return agg.sort(["total_value", "user_id"], descending=[True, False]).limit(k)


def segment_revenue(sf_dir: str):
    """customer ⋈ orders → revenue per market segment (J3).

    Round 1-3 used ``Dataset.join``; its per-join actor-pool setup cost
    ~15 s fixed regardless of size (the r3 bench `segment_revenue
    19.2 s` anomaly was mostly THIS, not host steal).  Now the shared
    ``equi_join``: broadcast customer→segment below the row threshold,
    bucketed union shuffle above — same result, ~10× faster at bench
    scale, and the honest 100-TB shape."""
    from address_address_matching_ray.pipelines.join import equi_join

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = equi_join(orders, cust, on="o_custkey", right_on="c_custkey")
    out = (joined.groupby("c_mktsegment")
           .aggregate(Sum("o_totalprice", alias_name="total_revenue"),
                      Count(alias_name="n_orders")))
    # ≤ a handful of market segments — see lineitem_agg note
    return round_cols(out, {"total_revenue": 2}).repartition(1).sort("c_mktsegment")


def nation_order_counts(sf_dir: str):
    """Broadcast-dim join: nation name lookup inside map_batches
    (small side via ray.put — no shuffle; SURVEY §2.4 J3 mapping)."""
    import ray

    nation = read(sf_dir, "nation").to_pandas()
    lookup = ray.put(dict(zip(nation.n_nationkey, nation.n_name)))
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def attach(df: pd.DataFrame) -> pa.Table:
        # Arrow out: the downstream hash join shuffles these blocks
        from address_address_matching_ray.stages.bcast import get_cached
        d = get_cached(lookup)
        return pa.table({
            "c_custkey": pa.array(df["c_custkey"].to_numpy()),
            "n_name": pa.array(df["c_nationkey"].map(d), pa.string())})

    from address_address_matching_ray.pipelines.join import equi_join

    orders = read(sf_dir, "orders", columns=["o_custkey"])
    withnation = equi_join(
        orders, cust.map_batches(attach, batch_format="pandas"),
        on="o_custkey", right_on="c_custkey")
    return (withnation.groupby("n_name")
            .aggregate(Count(alias_name="n_orders")).sort("n_name"))


def order_priority_distribution(sf_dir: str):
    """A2 analog: distribution with per-batch partial counts feeding a
    tiny final groupby (combiner pattern)."""
    ds = read(sf_dir, "orders", columns=["o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(t["o_orderpriority"].combine_chunks())
        return pa.table({"o_orderpriority": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("cnt", alias_name="n_orders"))
            .sort("o_orderpriority"))


def customers_without_orders(sf_dir: str, priority: str = "1-URGENT",
                             broadcast_threshold: int = 5_000_000):
    """Left-ANTI join via the shared scale-safe semi-join helper
    (``cluster.filter_out_ids``): customers with no order of the given
    priority.  Gives the semi-join machinery a DuckDB oracle
    (`NOT IN` subquery with a non-empty result)."""
    from address_address_matching_ray.stages.cluster import filter_out_ids

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    okeys = (read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
             .filter(expr=f"o_orderpriority == '{priority}'")
             .select_columns(["o_custkey"]))
    out = filter_out_ids(cust, okeys, id_col="c_custkey",
                         ids_col="o_custkey",
                         broadcast_threshold=broadcast_threshold)
    return out.repartition(1).sort("c_custkey")


def parts_by_brand(sf_dir: str):
    """part-table aggregate: count + mean retail price per brand."""
    ds = read(sf_dir, "part", columns=["p_brand", "p_retailprice"])
    out = ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Mean("p_retailprice", alias_name="avg_price"))
    return round_cols(out, {"avg_price": 4}).repartition(1).sort("p_brand")


def region_supplier_balance(sf_dir: str):
    """Three-table broadcast-dim chain (region → nation → supplier):
    total supplier account balance per region.  Both dims are tiny —
    ONE composed lookup broadcast via ``ray.put``, zero shuffles before
    the final 5-row aggregate."""
    import ray

    nation = read(sf_dir, "nation").to_pandas()
    region = read(sf_dir, "region").to_pandas()
    r_of = dict(zip(region.r_regionkey, region.r_name))
    nation_region = {int(k): r_of[int(r)]
                     for k, r in zip(nation.n_nationkey, nation.n_regionkey)} \
        if "n_regionkey" in nation.columns else {}
    lookup = ray.put(nation_region)

    def attach(df: pd.DataFrame) -> pa.Table:
        from address_address_matching_ray.stages.bcast import get_cached
        d = get_cached(lookup)
        return pa.table({
            "r_name": pa.array(df["s_nationkey"].map(d), pa.string()),
            "s_acctbal": pa.array(df["s_acctbal"].to_numpy(), pa.float64())})

    sup = read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    out = (sup.map_batches(attach, batch_format="pandas")
           .groupby("r_name")
           .aggregate(Sum("s_acctbal", alias_name="total_acctbal"),
                      Count(alias_name="n_suppliers")))
    return round_cols(out, {"total_acctbal": 2}).repartition(1).sort("r_name")


def distinct_event_types(sf_dir: str):
    """D2 analog (distinct via groupby)."""
    ds = read(sf_dir, "events", columns=["event_type"])
    return ds.groupby("event_type").count().sort("event_type").map_batches(
        lambda t: t.rename_columns(["event_type", "n"]).replace_schema_metadata(None),
        batch_format="pyarrow")


def sessions_ds(sf_dir: str, gap_minutes: int = 30, buckets: int = 64):
    """Sessionization (stream-shaped op): gap-split per user, bucketed —
    one vectorized task handles all users of a hash bucket (per-user
    ``map_groups`` would pay a Python call per user).  Ordering contract:
    sort within (user) inside the bucket, never globally (SURVEY §2.10).
    Unsorted; ``user_sessions`` adds the presentation sort, and
    ``temporal.event_sessions`` consumes this directly so the interval
    join's shuffle isn't preceded by a wasted global sort."""
    ds = read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_b", pa.array((uid % buckets).astype("int64")))

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gaps = g["ts"].diff().dt.total_seconds()
        brk = new_user | (gaps > gap_minutes * 60)
        sid = brk.cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("event_id", "count"))
        return out.reset_index(drop=True)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: sessions_bucket(g.drop(columns=["_b"])),
                batch_format="pandas"))


def user_sessions(sf_dir: str, gap_minutes: int = 30, buckets: int = 64):
    """``sessions_ds`` + the deterministic presentation sort."""
    return sessions_ds(sf_dir, gap_minutes=gap_minutes,
                       buckets=buckets).sort(["user_id", "session_start"])


def top_events_per_user(sf_dir: str, k: int = 3, buckets: int = 64):
    """Per-GROUP top-k (the "top-N documents per domain" pattern): each
    user's k highest-value events, deterministic tie-break on event_id.
    Bucketed like ``top_users`` — every user lives wholly in one hash
    bucket, so one vectorized sort + ``groupby.head`` per bucket is
    exact and no per-user Ray group is ever created."""
    ds = read(sf_dir, "events", columns=["user_id", "event_id", "value"])

    def add_b(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = uid.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True], kind="mergesort")
        out = g.groupby("user_id", sort=False).head(k).copy()
        out["rank"] = out.groupby("user_id", sort=False).cumcount() + 1
        return out.reset_index(drop=True)

    return (ds.map_batches(add_b, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: bucket_topk(g.drop(columns=["_b"])),
                batch_format="pandas")
            .sort(["user_id", "rank"]))


def stratified_sample(sf_dir: str, k: int = 10):
    """Stratified systematic sample: every k-th event per event_type in
    event_id order (deterministic, join-free — the training-data "take
    1/k of each language/source" op).  Strata are bounded (one per
    event_type) so one task per stratum is the right shape, like
    ``value_percentiles``; per-batch counting would need a two-pass
    prefix-sum for unbounded strata."""
    ds = read(sf_dir, "events", columns=["event_type", "event_id",
                                         "user_id", "value"])

    def take_every_kth(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort")
        return g.iloc[::k].reset_index(drop=True)

    return (ds.groupby("event_type")
            .map_groups(take_every_kth, batch_format="pandas")
            .sort(["event_type", "event_id"]))


def orders_with_returns(sf_dir: str, broadcast_threshold: int = 5_000_000,
                        bloom_max_bytes: int = 64 << 20):
    """Semi-join demo: orders that have at least one returned line item
    (``l_returnflag = 'R'``).  Uses the tiered ``semi_join_ids`` —
    broadcast exact at bench scale, Bloom-prefiltered bucketed exact at
    crawl scale (``pipelines/join.py``); a pytest pins all three tiers
    to the same result."""
    from address_address_matching_ray.pipelines.join import semi_join_ids

    orders = read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_totalprice"])
    rkeys = (read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
             .filter(expr="l_returnflag == 'R'")
             .select_columns(["l_orderkey"]))
    out = semi_join_ids(orders, rkeys, id_col="o_orderkey",
                        ids_col="l_orderkey",
                        broadcast_threshold=broadcast_threshold,
                        bloom_max_bytes=bloom_max_bytes)
    return out.repartition(1).sort("o_orderkey")


def window_functions(sf_dir: str, buckets: int = 64):
    """SQL window functions over a partitioned log (the §2.10 family
    extended): per-user ROW_NUMBER, running SUM and LAG delta, ordered
    by (ts, event_id).  Bucketed like ``sessions_ds`` — each user's
    history lives wholly in one hash bucket, one vectorized pandas
    pass per bucket, never a per-user Ray group.  Running sums are
    rounded(2) on BOTH sides: DuckDB's windowed SUM accumulates in
    segment-tree order, ours sequentially — same multiset, ±1e-11
    association noise."""
    ds = read(sf_dir, "events",
              columns=["user_id", "event_id", "ts", "value"])

    def add_b(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = uid.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    def bucket_window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        lag = grp["value"].shift()
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "row_no": (grp.cumcount() + 1).astype("int64").to_numpy(),
            "cum_value": grp["value"].cumsum().round(2).to_numpy(),
            "delta": (g["value"] - lag.fillna(g["value"])).to_numpy(),
        })

    return (ds.map_batches(add_b, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: bucket_window(g.drop(columns=["_b"])),
                batch_format="pandas")
            .sort(["user_id", "row_no"]))


def user_paths(sf_dir: str, buckets: int = 64):
    """Per-group ordered collect/string_agg (the "assemble a training
    sequence per entity" op): each user's event-type path in
    (ts, event_id) order plus its length.  Bucketed; assumes one
    user's sequence fits a task (same contract as sessionization)."""
    ds = read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                         "event_type"])

    def add_b(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = uid.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    def bucket_paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        out = grp["event_type"].agg(">".join).reset_index()
        out.columns = ["user_id", "path"]
        out["n_events"] = grp.size().to_numpy().astype("int64")
        return out

    return (ds.map_batches(add_b, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: bucket_paths(g.drop(columns=["_b"])),
                batch_format="pandas")
            .sort("user_id"))


def event_type_pivot(sf_dir: str):
    """Pivot / one-hot conditional aggregate: per-user event counts as
    WIDE columns.  The category set is an enum (bounded by nature);
    per-batch crosstab pre-aggregation (combiner) shrinks the shuffle
    to one wide row per (user, batch) before the vectorized hash
    aggregate — the "features per entity" layout trainers consume."""
    ds = read(sf_dir, "events", columns=["user_id", "event_type"])

    types = sorted(
        r["event_type"]
        for r in read(sf_dir, "events", columns=["event_type"])
        .groupby("event_type").count().take_all())
    cols = [f"n_{t}" for t in types]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["user_id", "event_type"], sort=False)
             .size().unstack(fill_value=0)
             .reindex(columns=types, fill_value=0))
        g.columns = [f"n_{c}" for c in g.columns]
        out = g.reset_index()
        for c in cols:
            out[c] = out[c].astype("int64")
        return out

    from address_address_matching_ray.pipelines.join import bucketed_sum

    # ~|users| distinct keys scale with the data — bucketed reduce,
    # not the native per-distinct-key aggregate (wedged 38+ min at
    # 200k users × 20M events where this runs in seconds)
    out = bucketed_sum(ds.map_batches(partial, batch_format="pandas"),
                       "user_id", cols)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in cols:
            df[c] = df[c].astype("int64")
        df["n_total"] = df[cols].sum(axis=1).astype("int64")
        return df

    return out.map_batches(total, batch_format="pandas").sort("user_id")


def revenue_rollup(sf_dir: str):
    """ROLLUP / subtotal aggregate (GROUP BY ROLLUP(flag, status)):
    detail rows + per-flag subtotals + a grand total, with the sentinel
    'ALL' instead of SQL NULL so value hashes are collation-free.

    Scale shape: ONE distributed groupby produces the bounded detail
    aggregate (≤ flag×status rows); every coarser rollup level is an
    exact re-aggregation of that tiny table in a single final task —
    subtotals never touch the fact table again."""
    ds = read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_linestatus", "l_quantity"])
    base = (ds.groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                       Count(alias_name="n_rows")))

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        detail = df[["l_returnflag", "l_linestatus", "sum_qty", "n_rows"]]
        sub = (df.groupby("l_returnflag", as_index=False)
               .agg(sum_qty=("sum_qty", "sum"), n_rows=("n_rows", "sum")))
        sub["l_linestatus"] = "ALL"
        grand = pd.DataFrame({
            "l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
            "sum_qty": [df["sum_qty"].sum()],
            "n_rows": [df["n_rows"].sum()]})
        out = pd.concat([detail, sub, grand], ignore_index=True)
        out["sum_qty"] = out["sum_qty"].round(2)
        out["n_rows"] = out["n_rows"].astype("int64")
        return (out.sort_values(["l_returnflag", "l_linestatus"])
                .reset_index(drop=True))

    return base.repartition(1).map_batches(rollup, batch_format="pandas")


def value_stats(sf_dir: str):
    """Statistical aggregates per event_type: mean / sample variance /
    sample stddev / min / max via the moments combiner — each batch
    ships one (n, Σv, Σv²) row per group, the groupby reduces ~5 rows
    per batch, and the final task turns moments into stats.  At 100 TB
    this is the canonical one-pass shape (never a per-group sort)."""
    ds = read(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        d = pd.DataFrame({"event_type": df["event_type"].to_numpy(object),
                          "v": v, "v2": v * v})
        g = (d.groupby("event_type", as_index=False, sort=False)
             .agg(n=("v", "size"), s=("v", "sum"), ss=("v2", "sum"),
                  mn=("v", "min"), mx=("v", "max")))
        g["n"] = g["n"].astype("int64")
        return g

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                      Sum("ss", alias_name="ss"),
                      Min("mn", alias_name="mn"), Max("mx", alias_name="mx")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.float64)
        s = df["s"].to_numpy(np.float64)
        var = (df["ss"].to_numpy(np.float64) - s * s / n) / (n - 1)
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(object),
            "n_events": df["n"].astype("int64").to_numpy(),
            "avg_value": np.round(s / n, 6),
            "var_value": np.round(var, 6),
            "std_value": np.round(np.sqrt(var), 6),
            "min_value": df["mn"].to_numpy(),
            "max_value": df["mx"].to_numpy()})

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort("event_type"))


def window_ranks(sf_dir: str, tiles: int = 4):
    """Rank-family window functions per event_type over the quantized
    value (``floor(value)`` — real ties, so RANK vs DENSE_RANK differ):
    rank, dense_rank, percent_rank, and NTILE(4) ordered by
    (value-bucket, event_id).  percent_rank = (rank-1)/(n-1) — integer
    operands, so the float is bit-identical to the SQL oracle.

    One task per event_type (bounded-cardinality contract, like
    ``value_percentiles``); for unbounded partitions use the hash-
    bucketed layout of ``window_functions``."""
    ds = read(sf_dir, "events", columns=["event_type", "event_id", "value"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["vb"] = np.floor(g["value"].to_numpy(np.float64)).astype("int64")
        g = g.sort_values(["vb", "event_id"], kind="mergesort") \
             .reset_index(drop=True)
        n = len(g)
        vb = g["vb"].to_numpy()
        starts = np.flatnonzero(np.r_[True, vb[1:] != vb[:-1]])
        runs = np.diff(np.append(starts, n))
        rnk = np.repeat(starts, runs) + 1
        drnk = np.repeat(np.arange(len(starts)) + 1, runs)
        pct = (rnk - 1) / (n - 1) if n > 1 else np.zeros(n)
        idx = np.arange(n)
        big = n % tiles
        size_big = n // tiles + 1
        size_small = max(n // tiles, 1)
        boundary = big * size_big
        tile = np.where(idx < boundary, idx // size_big,
                        big + (idx - boundary) // size_small) + 1
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "event_type": g["event_type"].to_numpy(object),
            "vb": vb,
            "rnk": rnk.astype("int64"), "drnk": drnk.astype("int64"),
            "pct_rank": pct,
            "tile4": tile.astype("int64")})

    return (ds.groupby("event_type")
            .map_groups(per_type, batch_format="pandas")
            .sort(["event_type", "vb", "event_id"]))


def daily_user_activity(sf_dir: str, buckets: int = 64):
    """FULL OUTER join of two sparse aggregates: per (user, day) click
    value vs purchase value — the "align two feature streams per
    entity" op where either side can be missing.  Key = packed
    (user_id, day) int64; ``equi_join(how='outer')`` takes the bucketed
    union-shuffle path (a streaming broadcast probe can't know which
    build rows went globally unmatched).  Missing sides coalesce to 0."""
    from address_address_matching_ray.pipelines.join import equi_join

    ds = read(sf_dir, "events", columns=["user_id", "ts", "event_type",
                                         "value"])

    def prep(event_type: str, out_col: str):
        # per-batch partial sums, then ONE 64-bucket shuffle with a
        # vectorized pandas sum per bucket.  Ray's native
        # groupby("uk").aggregate(Sum) pays a Python-level iteration
        # per distinct key in its reduce — ~18M (user, day) keys at
        # 20M events wedged the reduce stage for >8 min where the
        # bucketed reduce finishes in seconds (the same
        # high-cardinality-key rule as corpus_line_dedup /
        # duplicate_ngram_coverage).
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["event_type"] == event_type]
            day = df["ts"].to_numpy().astype("datetime64[D]").astype("int64")
            uk = df["user_id"].to_numpy(np.int64) * np.int64(100_000) + day
            g = (pd.DataFrame({"uk": uk, out_col: df["value"].to_numpy()})
                 .groupby("uk", as_index=False).sum())
            g["_b"] = g["uk"].to_numpy("int64") % buckets
            return g

        def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return (g.drop(columns=["_b"])
                    .groupby("uk", as_index=False)[out_col].sum())

        return (ds.map_batches(f, batch_format="pandas")
                .groupby("_b").map_groups(reduce_bucket,
                                          batch_format="pandas"))

    # pass the (known) aggregate schemas: ds.schema() on an
    # aggregate-fed side would execute the whole 20M-row plan once for
    # the probe and again for the join (measured 2× at 20M events)
    j = equi_join(prep("click", "click_value"),
                  prep("purchase", "purchase_value"),
                  on="uk", how="outer", buckets=buckets,
                  left_fields=[("uk", pa.int64()),
                               ("click_value", pa.float64())],
                  right_fields=[("uk", pa.int64()),
                                ("purchase_value", pa.float64())])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        uk = df["uk"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": uk // 100_000,
            "day_id": uk % 100_000,
            "click_value": df["click_value"].fillna(0.0).round(4).to_numpy(),
            "purchase_value":
                df["purchase_value"].fillna(0.0).round(4).to_numpy()})

    return (j.map_batches(finish, batch_format="pandas")
            .sort(["user_id", "day_id"]))


def returning_users(sf_dir: str, first_end: str = "2024-01-04",
                    second_start: str = "2024-01-28",
                    broadcast_threshold: int = 5_000_000):
    """Set INTERSECTION of two derived id sets (users active in the
    first window AND the last): per-batch distinct → distinct groupby
    per side, then the scale-tiered ``semi_join_ids`` (broadcast exact
    below threshold, Bloom + bucketed exact above).  The EXCEPT mirror
    is ``customers_without_orders``."""
    from address_address_matching_ray.pipelines.join import semi_join_ids

    ev = read(sf_dir, "events", columns=["user_id", "ts"])
    lo = np.datetime64(first_end)
    hi = np.datetime64(second_start)

    def side(first: bool):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            ts = df["ts"].to_numpy()
            m = ts < lo if first else ts >= hi
            return pd.DataFrame({
                "user_id": np.unique(df["user_id"].to_numpy(np.int64)[m])})

        from address_address_matching_ray.pipelines.join import (
            bucketed_distinct,
        )

        return bucketed_distinct(ev.map_batches(f, batch_format="pandas"),
                                 "user_id")

    out = semi_join_ids(side(True), side(False), id_col="user_id",
                        broadcast_threshold=broadcast_threshold)
    return out.repartition(1).sort("user_id")


def props_extract(sf_dir: str):
    """Semi-structured (JSON) column extraction + aggregate: pull the
    integer ``k`` field out of the ``props`` JSON string per event,
    aggregate per type.  Extraction is one vectorized regex pass per
    batch (the fixed-shape fast path; a general nested-JSON op would
    be an actor-pool stage with a real parser), then the moments
    combiner as in ``value_stats``."""
    ds = read(sf_dir, "events", columns=["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = (df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
             .astype("float64"))
        d = pd.DataFrame({"event_type": df["event_type"].to_numpy(object),
                          "k": k.to_numpy()})
        g = (d.groupby("event_type", as_index=False, sort=False)
             .agg(n=("k", "size"), s=("k", "sum"), mx=("k", "max")))
        g["n"] = g["n"].astype("int64")
        return g

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                      Max("mx", alias_name="mx")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(object),
            "n_events": df["n"].astype("int64").to_numpy(),
            "avg_k": np.round(df["s"].to_numpy() / df["n"].to_numpy(), 6),
            "max_k": df["mx"].astype("int64").to_numpy()})

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort("event_type"))


def value_median_mode(sf_dir: str):
    """Discrete order statistics per event_type: quantile_disc median /
    p90 (an ACTUAL element — hash-exact, no interpolation arithmetic)
    and the mode of the value bucket (max count, smallest-bucket tie-
    break).  DuckDB's quantile_disc(q) is the sorted element at index
    ceil(q·n)−1 (verified empirically at n∈{2..20}).  One task per
    event_type (bounded groups, same contract as value_percentiles);
    the unbounded-key shape is the KLL sketch (approx_value_percentiles)."""
    import math

    ds = read(sf_dir, "events", columns=["event_type", "value"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(np.float64))
        n = len(v)

        def qd(q: float) -> float:
            return float(v[min(max(math.ceil(q * n) - 1, 0), n - 1)])

        vb = np.floor(g["value"].to_numpy(np.float64)).astype("int64")
        uk, cnt = np.unique(vb, return_counts=True)   # sorted keys →
        mode = uk[np.argmax(cnt)]                     # argmax = smallest tie
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_events": np.array([n], dtype="int64"),
            "median_disc": [qd(0.5)], "p90_disc": [qd(0.9)],
            "mode_vb": np.array([mode], dtype="int64")})

    return (ds.groupby("event_type")
            .map_groups(per_type, batch_format="pandas")
            .repartition(1).sort("event_type"))


def moving_avg(sf_dir: str, frame: int = 3, buckets: int = 64):
    """Window FRAMES over a partitioned log: per-user moving average of
    the last ``frame``+1 rows (ROWS BETWEEN frame PRECEDING AND CURRENT
    ROW), plus FIRST_VALUE of the partition, ordered by (ts, event_id).
    Same hash-bucketed layout as ``window_functions`` — every user's
    history lives wholly in one bucket, one vectorized pandas pass per
    bucket, never a per-user Ray group.  Averages round(6) on both
    sides (pandas' sliding-sum rolling kernel vs the oracle's per-frame
    sum associate differently at the last ulp)."""
    ds = read(sf_dir, "events",
              columns=["user_id", "event_id", "ts", "value"])

    def add_b(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = uid.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    def bucket_frame(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        mov = (grp["value"].rolling(frame + 1, min_periods=1).mean()
               .reset_index(level=0, drop=True))
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "row_no": (grp.cumcount() + 1).astype("int64").to_numpy(),
            "mov_avg": mov.round(6).to_numpy(),
            "first_v": grp["value"].transform("first").to_numpy()})

    return (ds.map_batches(add_b, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: bucket_frame(g.drop(columns=["_b"])),
                batch_format="pandas")
            .sort(["user_id", "row_no"]))


def event_correlations(sf_dir: str):
    """Bivariate aggregates per event_type: Pearson correlation and
    sample covariance between the event value and the ``k`` field of
    the props JSON — the co-moment combiner (n, Σx, Σy, Σxy, Σx², Σy²)
    per batch, a tiny groupby, stats in one final task.  Same one-pass
    100-TB shape as ``value_stats``; round(6) + 0.0 on both sides
    (near-zero correlations may round to ±0.0)."""
    ds = read(sf_dir, "events", columns=["event_type", "value", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["value"].to_numpy(np.float64)
        y = (df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
             .astype("float64").to_numpy())
        d = pd.DataFrame({"event_type": df["event_type"].to_numpy(object),
                          "x": x, "y": y, "xy": x * y, "xx": x * x,
                          "yy": y * y})
        g = (d.groupby("event_type", as_index=False, sort=False)
             .agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                  sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum")))
        g["n"] = g["n"].astype("int64")
        return g

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("syy", alias_name="syy")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.float64)
        sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
        cov = (df["sxy"].to_numpy() - sx * sy / n) / (n - 1)
        vx = (df["sxx"].to_numpy() - sx * sx / n) / (n - 1)
        vy = (df["syy"].to_numpy() - sy * sy / n) / (n - 1)
        r = cov / np.sqrt(vx * vy)
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(object),
            "n_events": df["n"].astype("int64").to_numpy(),
            "covar": np.round(cov, 6) + 0.0,
            "corr_vk": np.round(r, 6) + 0.0})

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort("event_type"))


def funnel_conversion(sf_dir: str, first: str = "click",
                      then: str = "purchase", window_hours: int = 24,
                      buckets: int = 64):
    """Funnel analysis: users who performed ``first``, and of those the
    ones who performed ``then`` within ``window_hours`` AFTER their
    first ``first`` event (classic product-analytics conversion op).

    Scale shape: ONE user-hash bucket shuffle — a user's events live
    wholly in one bucket, so the per-user anchor (min ts of ``first``)
    and the conversion test are local and vectorized; each bucket
    collapses to three partial-count rows, the final aggregate runs
    over ``3 × buckets`` rows.
    """
    ds = read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def add_b(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = uid.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    w = pd.Timedelta(hours=window_hours)

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        t0 = (g.loc[g["event_type"] == first]
              .groupby("user_id", sort=False)["ts"].min())
        m = (g.loc[g["event_type"] == then, ["user_id", "ts"]]
             .merge(t0.rename("t0"), left_on="user_id", right_index=True))
        conv = m.loc[(m["ts"] > m["t0"]) & (m["ts"] <= m["t0"] + w),
                     "user_id"].nunique()
        return pd.DataFrame({
            "stage": ["all_users", first, f"{first}_then_{then}"],
            "n_users": np.array([g["user_id"].nunique(), len(t0), conv],
                                dtype="int64")})

    return (ds.map_batches(add_b, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: bucket_fn(g.drop(columns=["_b"])),
                batch_format="pandas")
            .groupby("stage").aggregate(Sum("n_users", alias_name="n_users"))
            .sort("stage"))


def cohort_retention(sf_dir: str, buckets: int = 64):
    """Cohort retention: users grouped by the day of their FIRST event
    (cohort), counted on each later day-offset they were active — the
    standard growth-analytics triangle.

    Same one-shuffle shape as ``funnel_conversion``: per user-hash
    bucket, the cohort day and the distinct (user, offset) activity set
    are computed vectorized; buckets emit partial (cohort_day,
    day_offset, n) counts (bounded by days², not by users), and a tiny
    groupby sums them.
    """
    ds = read(sf_dir, "events", columns=["user_id", "ts"])

    def add_b(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = uid.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        day = g["ts"].dt.floor("D")
        cohort = day.groupby(g["user_id"]).transform("min")
        off = (day - cohort).dt.days.astype("int64")
        act = pd.DataFrame({"user_id": g["user_id"], "cohort_day": cohort,
                            "day_offset": off}).drop_duplicates()
        out = (act.groupby(["cohort_day", "day_offset"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype("int64")
        # pin the parquet's microsecond unit (pandas floor may yield ns)
        out["cohort_day"] = out["cohort_day"].astype("datetime64[us]")
        return out

    return (ds.map_batches(add_b, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: bucket_fn(g.drop(columns=["_b"])),
                batch_format="pandas")
            .groupby(["cohort_day", "day_offset"])
            .aggregate(Sum("n", alias_name="n_users"))
            .map_batches(
                lambda df: df.assign(
                    cohort_day=df["cohort_day"].astype("datetime64[us]")),
                batch_format="pandas")
            .sort(["cohort_day", "day_offset"]))


def trailing_active_users(sf_dir: str, window_days: int = 7,
                          buckets: int = 64):
    """Trailing-window distinct actives (the WAU/MAU metric): for every
    observed day, COUNT(DISTINCT user_id) over the ``window_days``-day
    window ending that day — a rolling windowed COUNT DISTINCT, which
    no single groupby expresses.

    Shape: per-batch distinct (user, day) pairs fan out to at most
    ``window_days`` slim (user, window_day) rows, filtered against the
    broadcast observed-day set; ONE hash-bucket shuffle on (user,
    window_day) makes global dedup bucket-local, buckets emit bounded
    (day, n) partials, and a tiny groupby sums them.  The only driver
    materialization is the observed-day set — bounded by the calendar
    span (≤ ~40k rows for a century), not by data volume.
    """
    import ray

    from address_address_matching_ray.stages.bcast import get_cached

    us_day = np.int64(86_400_000_000)
    ds = read(sf_dir, "events", columns=["user_id", "ts"])

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(df["ts"].to_numpy("datetime64[us]")
                      .astype("int64") // us_day)
        return pd.DataFrame({"d": d})

    days = np.sort(
        ds.map_batches(day_partial, batch_format="pandas")
        .groupby("d").count().to_pandas()["d"].to_numpy("int64"))
    dref = ray.put(days)
    mix = np.uint64(0x9E3779B97F4A7C15)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        obs = get_cached(dref)
        d = df["ts"].to_numpy("datetime64[us]").astype("int64") // us_day
        sub = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "d": d}).drop_duplicates()
        u = np.tile(sub["user_id"].to_numpy(), window_days)
        w = np.concatenate([sub["d"].to_numpy() + k
                            for k in range(window_days)])
        pos = np.minimum(np.searchsorted(obs, w), len(obs) - 1)
        m = obs[pos] == w
        u, w = u[m], w[m]
        with np.errstate(over="ignore"):
            h = (u.astype("uint64") * mix) ^ w.astype("uint64")
        return pd.DataFrame({
            "user_id": u, "w": w,
            "_b": (h % np.uint64(buckets)).astype("int64")})

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        sub = g.drop_duplicates(["user_id", "w"])
        cnt = sub.groupby("w", sort=False).size()
        return pd.DataFrame({"w": cnt.index.to_numpy("int64"),
                             "n": cnt.to_numpy().astype("int64")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": (df["w"].to_numpy("int64") * us_day)
            .astype("datetime64[us]"),
            "active_users": df["active_users"].astype("int64")})

    return (ds.map_batches(expand, batch_format="pandas")
            .groupby("_b").map_groups(
                lambda g: bucket_fn(g.drop(columns=["_b"])),
                batch_format="pandas")
            .groupby("w").aggregate(Sum("n", alias_name="active_users"))
            .map_batches(finish, batch_format="pandas")
            .sort("day"))


def latest_events(sf_dir: str, buckets: int = 64):
    """Per-group argmax (SQL ``DISTINCT ON`` / row_number()=1): each
    user's most recent event row, deterministic tie-break on event_id
    descending.  The "latest snapshot per key" op every CDC/compaction
    pipeline runs.

    Bucketed like ``top_events_per_user``: a user's rows live wholly in
    one hash bucket, so one vectorized sort + ``groupby.head(1)`` per
    bucket is exact — no per-user Ray groups, no driver pull."""
    ds = read(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                         "event_type", "value"])

    def add_b(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = uid.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    def bucket_latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ascending=[True, False, False], kind="mergesort")
        out = g.groupby("user_id", sort=False).head(1).copy()
        out["ts"] = out["ts"].astype("datetime64[us]")
        return out.reset_index(drop=True)

    return (ds.map_batches(add_b, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: bucket_latest(g.drop(columns=["_b"])),
                batch_format="pandas")
            .sort("user_id"))


def value_zscore(sf_dir: str, buckets: int = 64):
    """Per-group z-score normalization of the value column — the
    standard feature-normalization transform before model training.
    Two passes, no row shuffle: pass 1 reduces the events to one
    (n, Σv, Σv²) moments row per event_type (bounded group count);
    pass 2 broadcasts the tiny stats table and standardizes every row
    inside ``map_batches``.  At 100 TB the data moves ZERO times —
    only the ~5-row stats table does.  Ulp-level float divergence vs
    the SQL window oracle is absorbed by round-6 (the value_stats
    recipe)."""
    import ray

    ds = read(sf_dir, "events", columns=["event_id", "event_type",
                                         "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        d = pd.DataFrame({"event_type": df["event_type"].to_numpy(object),
                          "v": v, "v2": v * v})
        g = (d.groupby("event_type", as_index=False, sort=False)
             .agg(n=("v", "size"), s=("v", "sum"), ss=("v2", "sum")))
        g["n"] = g["n"].astype("int64")
        return g

    stats = (ds.map_batches(partial, batch_format="pandas")
             .groupby("event_type")
             .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                        Sum("ss", alias_name="ss"))
             .to_pandas())  # bounded: one row per event_type
    n = stats["n"].to_numpy(np.float64)
    s = stats["s"].to_numpy(np.float64)
    mean = s / n
    std = np.sqrt((stats["ss"].to_numpy(np.float64) - s * s / n) / (n - 1))
    lut = pd.DataFrame({"event_type": stats["event_type"].to_numpy(object),
                        "_m": mean, "_sd": std})
    ref = ray.put(lut)

    def standardize(df: pd.DataFrame) -> pd.DataFrame:
        from address_address_matching_ray.stages.bcast import get_cached

        j = df.merge(get_cached(ref), on="event_type", how="left")
        v = j["value"].to_numpy(np.float64)
        return pd.DataFrame({
            "event_id": j["event_id"].to_numpy(),
            "event_type": j["event_type"].to_numpy(object),
            "value": v,
            "z_value": np.round(
                (v - j["_m"].to_numpy(np.float64))
                / j["_sd"].to_numpy(np.float64), 6)})

    return ds.map_batches(standardize, batch_format="pandas").sort("event_id")


def value_mad(sf_dir: str):
    """Per-group robust location/scale: median and median absolute
    deviation (MAD) — outlier-resistant quality-score thresholds use
    these instead of mean/std.  Bounded group count (one per
    event_type) → one task per group holding its values, two exact
    ``quantile_cont``-arithmetic medians (bit-identical to DuckDB,
    the value_percentiles recipe), floor-quantized to 1e-6 on both
    sides.  Unbounded keys should use the KLL sketch route."""
    from address_address_matching_ray.pipelines.temporal import (
        quantile_cont,
    )

    ds = read(sf_dir, "events", columns=["event_type", "value"])

    def mad(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(np.float64))
        med = quantile_cont(v, 0.5)
        dev = np.sort(np.abs(g["value"].to_numpy(np.float64) - med))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "med_value": [np.floor(med * 1e6) / 1e6],
            "mad_value": [np.floor(quantile_cont(dev, 0.5) * 1e6) / 1e6],
            "n": np.array([len(v)], dtype="int64")})

    return (ds.groupby("event_type").map_groups(mad, batch_format="pandas")
            .sort("event_type"))


def hash_sample(sf_dir: str, rate_pct: int = 10):
    """Deterministic hash-Bernoulli corpus sampling: keep a document
    iff ``(doc_id * 2654435761) % 1000 < rate_pct * 10``.  The
    workhorse subsample for pipeline development at 100 TB — unlike
    ``Dataset.random_sample`` it is reproducible across runs and
    resumable shards (no RNG state), embarrassingly parallel
    (shuffle-free filter), and any node can decide membership locally.
    Exact integer arithmetic on both sides — no float parity caveat.
    (Knuth multiplicative hashing; ids here are small enough that the
    64-bit product does not wrap, so BIGINT SQL agrees; at real scale
    wrap both sides to uint64.)"""
    ds = read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
        with np.errstate(over="ignore"):
            m = (ids * np.uint64(2654435761)) % np.uint64(1000)
        return t.filter(pa.array(m < np.uint64(rate_pct * 10)))

    return ds.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def source_quota_sample(sf_dir: str, quota: int = 30, buckets: int = 64):
    """Per-domain quota sampling (crawl-balancing: cap any one source's
    contribution to the training mix at ``quota`` docs).  The kept set
    is the ``quota`` docs with the smallest Knuth hash of ``doc_id``
    per source — a deterministic "random" pick that is reproducible
    across runs, resumable shards and re-partitionings (same property
    as ``hash_sample``; ref semantics: K3/K4 caps, SURVEY §2.7).

    Scale shape: source cardinality is unbounded at crawl scale (~100M
    hosts), so this never makes one Ray group per source.  A per-batch
    combiner keeps at most ``quota`` rows per (source, batch) — the
    shuffle carries O(quota · batches) rows, not the corpus — then a
    hash-bucket shuffle on source makes the per-source top-``quota``
    global; each bucket holds many sources, each source one bucket."""
    ds = read(sf_dir, "documents",
              columns=["doc_id", "source", "lang", "n_chars"])

    def _rank_key(ids: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return ((ids.astype(np.uint64) * np.uint64(2654435761))
                    % np.uint64(4294967296)).astype("int64")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_k=_rank_key(df["doc_id"].to_numpy()))
        df = (df.sort_values(["source", "_k", "doc_id"], kind="mergesort")
              .groupby("source", sort=False).head(quota))
        h = pd.util.hash_array(df["source"].to_numpy(dtype=object))
        return df.assign(_b=(h % np.uint64(buckets)).astype("int64"))

    def bucket_take(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["source", "_k", "doc_id"], kind="mergesort")
             .groupby("source", sort=False).head(quota))
        return g.drop(columns=["_b", "_k"])

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_b").map_groups(bucket_take, batch_format="pandas")
            .sort("doc_id"))


def winsorized_stats(sf_dir: str):
    """Per-group winsorized mean (clip values to [p05, p95] before
    averaging) — the outlier-robust aggregate a metrics pipeline runs
    over heavy-tailed web data.  Quantiles use the DuckDB
    ``quantile_cont`` arithmetic verbatim (the ``value_percentiles``
    parity recipe).  The clipped mean is computed over 1e-6-grain
    integer micro-units (``floor(clip(v)*1e6)`` summed as int64, then
    one float division) so the aggregate is summation-ORDER-FREE —
    float sums are not associative, so a quantized float mean could
    differ from the oracle in the last ulp; integer sums cannot.
    Group count is bounded (one per event_type) so one task per group
    holds the group's values; unbounded keys should use the KLL sketch
    route (``approx_value_percentiles``) instead."""
    from address_address_matching_ray.pipelines.temporal import quantile_cont

    ds = read(sf_dir, "events", columns=["event_type", "value"])

    def wins(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(np.float64)
        sv = np.sort(v)
        lo, hi = quantile_cont(sv, 0.05), quantile_cont(sv, 0.95)
        clipped = np.minimum(np.maximum(v, lo), hi)
        micro = np.floor(clipped * 1e6).astype(np.int64)
        wmean = (int(micro.sum()) / len(v)) / 1e6
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "p05_value": [np.floor(lo * 1e6) / 1e6],
            "p95_value": [np.floor(hi * 1e6) / 1e6],
            "winsorized_mean": [wmean],
            "n": np.array([len(v)], dtype="int64")})

    return (ds.groupby("event_type").map_groups(wins, batch_format="pandas")
            .sort("event_type"))


def hash_split(sf_dir: str, train_pct: int = 90, val_pct: int = 5):
    """Deterministic train/val/test split: Knuth hash of ``doc_id``
    modulo 100 buckets the corpus at train/val/test = train_pct /
    val_pct / remainder.  Same properties as ``hash_sample`` — stable
    across runs, partitionings and resumes, no RNG state to ship;
    shuffle-free single pass (the 100-TB split IS this map).  A doc's
    split never changes when the corpus grows, so incremental crawls
    cannot leak later additions across split boundaries."""
    ds = read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    t_hi, v_hi = train_pct * 10, (train_pct + val_pct) * 10

    def tag(t):
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            m = (ids * np.uint64(2654435761)) % np.uint64(1000)
        split = np.where(m < t_hi, "train",
                         np.where(m < v_hi, "val", "test"))
        return t.append_column("split", pa.array(split))

    return ds.map_batches(tag, batch_format="pyarrow").sort("doc_id")


def group_stable_split(sf_dir: str, train_pct: int = 80, val_pct: int = 10):
    """Leakage-safe split: the hash is taken over ``source`` (the
    crawl host), so ALL documents of one source land in the same split
    — near-duplicate pages from the same site can never straddle
    train/test (the contamination mode a doc-level split invites).
    Same shuffle-free single-pass shape as ``hash_split``; the string
    hash is pandas' stable 64-bit siphash re-expressed below in SQL via
    a md5-prefix hash so both sides agree exactly."""
    ds = read(sf_dir, "documents", columns=["doc_id", "source"])
    t_hi, v_hi = train_pct * 10, (train_pct + val_pct) * 10

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        # md5 prefix — engine-portable (DuckDB md5() agrees), cached
        # per distinct source within the batch (20 hosts, not 20k rows)
        uniq, inv = np.unique(df["source"].to_numpy(dtype=object),
                              return_inverse=True)
        h = np.array([int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                      % 1000 for s in uniq], dtype=np.int64)[inv]
        split = np.where(h < t_hi, "train",
                         np.where(h < v_hi, "val", "test"))
        return df.assign(split=split)

    return ds.map_batches(tag, batch_format="pandas").sort("doc_id")
