"""Temporal / ordered operators Ray Data lacks natively: as-of join,
interval (range) join, sliding (hopping) windows, exact + sketched
distinct counts, per-group percentiles.

The joins are built as ONE bucketed shuffle (SURVEY §2.11 extension
surface; the brief's custom-operator list): tag each side, union into a
padded common schema, hash-partition on the equality key ``by``, and
run a vectorized ``pd.merge_asof`` per bucket.  Partitioning
assumption, stated per the custom-operator contract: all rows of one
``by`` key land in one task — true for per-user event streams (a user's
history fits memory); a pathologically hot key would need the salting +
re-merge treatment ``stages/pairs.py`` applies to hot blocks.

Scale notes:
- the union costs no extra shuffle — both sides stream into the same
  ``groupby(_b)`` exchange a plain hash join would need anyway;
- per-bucket work is one mergesort + one ``merge_asof`` (linear merge),
  never an all-pairs product;
- sliding windows expand rows by ``window/slide`` (the algebraic
  minimum for overlap assignment) *after* column pruning, then feed the
  same combiner-style aggregate as the tumbling path;
- distinct counts pre-dedup inside every batch before shuffling, so the
  exchange carries at most one row per (key, value) pair per batch, and
  the KMV variant (``functions/sketch.py``) caps that at ``k`` rows per
  key per batch with a bounded-error estimate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Sum

from address_address_matching_ray.functions.sketch import (
    hash_values, kll_merge, kll_partial, kll_quantile, kll_weight,
    kmv_estimate, kmv_merge, kmv_partial,
)
from address_address_matching_ray.pipelines.relational import read, round_cols

_US_PER_MIN = 60_000_000


def _fields_of(ds) -> list[tuple[str, pa.DataType]]:
    """(name, arrow type) pairs from a Dataset schema — normalizes the
    PandasBlockSchema that pandas-block datasets report (numpy dtypes)
    to Arrow types so both block kinds pad identically."""
    s = ds.schema()
    out = []
    for n, t in zip(s.names, s.types):
        if not isinstance(t, pa.DataType):
            dt = np.dtype(t)
            # pandas blocks report strings as numpy object dtype
            t = pa.string() if dt == np.dtype("O") \
                else pa.from_numpy_dtype(dt)
        out.append((n, t))
    return out


def _bucket_ids(col: pa.ChunkedArray, buckets: int) -> np.ndarray:
    if pa.types.is_integer(col.type):
        h = hash_values(col.to_numpy(zero_copy_only=False))
    else:
        from pandas.util import hash_array
        h = hash_array(col.to_pandas().to_numpy(dtype=object)).astype(np.uint64)
    return (h % np.uint64(buckets)).astype("int64")


def _pad_to(fields: list[tuple[str, pa.DataType]], side: int, by: str,
            buckets: int):
    """map_batches fn: project a side onto the union schema (missing
    columns → typed nulls), tag ``_side`` and the ``_b`` hash bucket."""
    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        names, arrays = [], []
        for name, typ in fields:
            names.append(name)
            if name in t.column_names:
                arrays.append(t[name].combine_chunks().cast(typ))
            else:
                arrays.append(pa.nulls(n, typ))
        names += ["_side", "_b"]
        arrays += [pa.array(np.full(n, side, dtype=np.int8)),
                   pa.array(_bucket_ids(t[by], buckets))]
        return pa.table(dict(zip(names, arrays)))
    return f


def asof_join(left, right, *, on: str, right_on: str, by: str,
              buckets: int = 64, how: str = "inner"):
    """Distributed as-of join: for every left row, the right row of the
    same ``by`` key with the greatest ``right_on`` <= left ``on``
    (backward direction, exact matches allowed — DuckDB ``ASOF JOIN``
    semantics).  Column names must already be disjoint apart from
    ``by``.  Returns left+right columns; ``how='inner'`` drops left
    rows with no match, ``how='left'`` keeps them (integer right
    columns widen to float64 for the nulls, as in any pandas left
    join)."""
    lf = _fields_of(left)
    rf = [(n, t) for n, t in _fields_of(right) if n != by]
    union_fields = lf + rf
    left_cols = [n for n, _ in lf]
    right_cols = [by] + [n for n, _ in rf]
    # integer dtypes fall to float64 through null-padding; restore per
    # side after the split (each side's own columns are null-free)
    restore = {n: np.dtype(t.to_pandas_dtype())
               for n, t in union_fields if pa.types.is_integer(t)}

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == 0, left_cols]
        r = g.loc[g["_side"] == 1, right_cols]
        for c in l.columns.intersection(restore):
            l[c] = l[c].astype(restore[c])
        for c in r.columns.intersection(restore):
            r[c] = r[c].astype(restore[c])
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values(right_on, kind="mergesort")
        out = pd.merge_asof(l, r, left_on=on, right_on=right_on, by=by,
                            direction="backward", allow_exact_matches=True)
        if how == "inner":
            out = out[out[right_on].notna()]
            for c in out.columns.intersection(restore):
                out[c] = out[c].astype(restore[c])
        else:
            # how='left': merge_asof widens right-side ints to float64
            # only in buckets with unmatched left rows — cast them
            # unconditionally so every bucket emits one block schema
            # (mixed int64/float64 blocks break downstream Arrow
            # unification; round-4 ADVICE)
            for c in out.columns.intersection(restore):
                if c in left_cols:
                    out[c] = out[c].astype(restore[c])
                else:
                    out[c] = out[c].astype(np.float64)
        return out.reset_index(drop=True)

    tagged = (left.map_batches(_pad_to(union_fields, 0, by, buckets),
                               batch_format="pyarrow")
              .union(right.map_batches(_pad_to(union_fields, 1, by, buckets),
                                       batch_format="pyarrow")))
    return tagged.groupby("_b").map_groups(
        lambda g: merge_bucket(g.drop(columns=["_b"])),
        batch_format="pandas")


def interval_join(points, intervals, *, on: str, start: str, end: str,
                  by: str, buckets: int = 64):
    """Range join of points to NON-OVERLAPPING per-key intervals
    (``start <= on <= end``): the as-of join against ``start`` finds
    the only candidate interval, then an end-bound filter keeps real
    containment.  For OVERLAPPING intervals use ``overlap_join``
    (chunk-replicated flat expansion) — this fast path remains for the
    non-overlapping case, matching DuckDB's own ASOF rewrite."""
    j = asof_join(points, intervals, on=on, right_on=start, by=by,
                  buckets=buckets, how="inner")

    def within(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.less_equal(t[on], t[end]))

    return j.map_batches(within, batch_format="pyarrow")


def _cast_ts_us(cols: list[str]):
    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for c in cols:
            i = t.column_names.index(c)
            t = t.set_column(i, c, pc.cast(t[c], pa.timestamp("us")))
        return t.replace_schema_metadata(None)
    return f


# ── query surfaces ────────────────────────────────────────────────


def purchase_attribution(sf_dir: str, buckets: int = 64):
    """Last-touch attribution: every purchase joined to the user's most
    recent click at-or-before it (the canonical as-of workload)."""
    ev = read(sf_dir, "events",
              columns=["event_id", "user_id", "ts", "event_type", "value"])
    p = (ev.filter(expr="event_type == 'purchase'")
         .drop_columns(["event_type"]))
    c = (ev.filter(expr="event_type == 'click'")
         .drop_columns(["event_type"])
         .map_batches(lambda t: t.rename_columns(
             ["click_event_id", "user_id", "click_ts", "click_value"]),
             batch_format="pyarrow"))
    out = asof_join(p, c, on="ts", right_on="click_ts", by="user_id",
                    buckets=buckets)
    return (out.select_columns(["event_id", "user_id", "ts", "value",
                                "click_event_id", "click_ts", "click_value"])
            .map_batches(_cast_ts_us(["ts", "click_ts"]),
                         batch_format="pyarrow")
            .sort("event_id"))


def event_sessions(sf_dir: str, gap_minutes: int = 30, buckets: int = 64):
    """Interval join: each event attached to the session window that
    contains it (sessions are non-overlapping per user by
    construction)."""
    from address_address_matching_ray.pipelines.relational import sessions_ds

    ev = read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    sess = sessions_ds(sf_dir, gap_minutes=gap_minutes, buckets=buckets)
    out = interval_join(ev, sess, on="ts", start="session_start",
                        end="session_end", by="user_id", buckets=buckets)
    return (out.select_columns(["event_id", "user_id", "ts",
                                "session_start", "session_end", "n_events"])
            .map_batches(_cast_ts_us(["ts", "session_start", "session_end"]),
                         batch_format="pyarrow")
            .sort("event_id"))


def sliding_windows(sf_dir: str, window_minutes: int = 60,
                    slide_minutes: int = 15):
    """Hopping-window aggregate: 1 h windows advancing every 15 min —
    each event lands in ``window/slide`` windows via one vectorized row
    expansion, then the tumbling-window combiner aggregate."""
    assert window_minutes % slide_minutes == 0
    k = window_minutes // slide_minutes
    slide_us = slide_minutes * _US_PER_MIN
    ds = read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def expand(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        base = us // slide_us
        # per-batch combiner: collapse the k× row expansion to ≤
        # (types × windows-in-span) partial rows BEFORE the shuffle —
        # without it the groupby sorts rows×k (80M rows at 20M events,
        # measured 181.7 s).  Needs the big batch_size below: at the
        # default 1024-row batches almost every expanded key is unique
        # and the combiner compresses nothing.  Integer keys end to
        # end (type code packed with the slide index) — no object-
        # dtype groupby in the hot path.
        codes, uniq = pd.factorize(
            t["event_type"].to_numpy(zero_copy_only=False), sort=True)
        slot = (base[:, None] - np.arange(k)[None, :]).ravel()
        key = np.repeat(codes.astype("int64"), k) * np.int64(2**44) + slot
        val = np.repeat(t["value"].to_numpy(zero_copy_only=False), k)
        u, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv)
        s = np.bincount(inv, weights=val)
        return pd.DataFrame({
            "event_type": uniq[(u // np.int64(2**44)).astype(np.intp)],
            "window_start": (u % np.int64(2**44)) * slide_us,
            "n_events": n.astype("int64"),
            "sum_value": s})

    # window_start stays int64 through the shuffle; the tail
    # _cast_ts_us restores timestamp[us].  Final reduce is bucketed —
    # even 43k (type, window) keys took minutes in the native reduce
    # over the 3M partial rows (measured; see join.bucketed_sum)
    from address_address_matching_ray.pipelines.join import bucketed_sum

    out = bucketed_sum(
        ds.map_batches(expand, batch_format="pyarrow",
                       batch_size=500_000),
        ["event_type", "window_start"], ["n_events", "sum_value"],
        bucket_on="window_start")
    out = round_cols(out, {"sum_value": 4})
    return (out.map_batches(_cast_ts_us(["window_start"]),
                            batch_format="pyarrow")
            .sort(["event_type", "window_start"]))


def distinct_users(sf_dir: str, buckets: int = 64):
    """Exact COUNT(DISTINCT user_id) per event_type: per-batch pair
    dedup (combiner) → hash-bucket shuffle keyed on user_id so each
    pair dedups globally in one task → tiny per-type count sum."""
    ds = read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        pairs = t.group_by(["event_type", "user_id"]).aggregate([])
        return pairs.append_column(
            "_b", pa.array(_bucket_ids(pairs["user_id"], buckets)))

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["event_type", "user_id"])
        vc = u["event_type"].value_counts()
        return pd.DataFrame({"event_type": vc.index,
                             "cnt": vc.to_numpy().astype("int64")})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: bucket_counts(g.drop(columns=["_b"])),
                batch_format="pandas")
            .groupby("event_type")
            .aggregate(Sum("cnt", alias_name="n_users"))
            .sort("event_type"))


def approx_distinct_users(sf_dir: str, k: int = 64):
    """KMV-sketched COUNT(DISTINCT): the shuffle carries at most ``k``
    hash rows per (event_type, batch) regardless of input size — the
    100-TB shape for distinct counting.  Deterministic (fixed hash), so
    the row-level result is stable; the accuracy bound lives in
    ``test_temporal.py`` (rel. err ~ 1/sqrt(k-2))."""
    ds = read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_values(df["user_id"].to_numpy())
        parts = (df.assign(_h=h).groupby("event_type", sort=False)["_h"]
                 .apply(lambda s: kmv_partial(s.to_numpy(), k)))
        return pd.DataFrame({
            "event_type": np.repeat(parts.index.to_numpy(),
                                    [len(v) for v in parts]),
            "_h": np.concatenate(list(parts)) if len(parts) else
                  np.array([], dtype=np.uint64)})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        sk = kmv_merge(g["_h"].to_numpy().astype(np.uint64), k)
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "n_users_est": [kmv_estimate(sk, k)]})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type")
            .map_groups(finalize, batch_format="pandas")
            .sort("event_type"))


def quantile_cont(sorted_v: np.ndarray, q: float) -> float:
    """SQL ``quantile_cont`` with DuckDB's exact interpolation
    arithmetic: ``RN = (n-1)*q``, ``lo*(1-d) + hi*d`` where
    ``d = RN - floor(RN)`` (duckdb quantile.cpp Interpolator).
    Verified bit-identical to DuckDB on sf0.001/0.01/0.1 events;
    ``lo + d*(hi-lo)`` (numpy's form) is NOT bit-identical."""
    n = len(sorted_v)
    if n == 0:
        return float("nan")
    rn = (n - 1) * q
    frn = int(np.floor(rn))
    crn = int(np.ceil(rn))
    if frn == crn:
        return float(sorted_v[frn])
    d = rn - frn
    return float(sorted_v[frn] * (1.0 - d) + sorted_v[crn] * d)


def value_percentiles(sf_dir: str):
    """Exact per-group percentiles (p50/p95, linear interpolation =
    SQL ``quantile_cont``).  Group count is bounded (one per
    event_type), so one task per group holding the group's values is
    the right shape; unbounded-cardinality keys should use the KMV/
    sketch route instead.  Interpolation reproduces DuckDB's
    ``quantile_cont`` arithmetic bit-for-bit (``lo*(1-d) + hi*d`` with
    ``d = (n-1)*q - floor((n-1)*q)``; numpy's lerp differs in the last
    ulp and broke hash parity in round 3), then floor-quantizes to 1e-6
    on both sides (same tie-avoidance as text_annotate)."""
    ds = read(sf_dir, "events", columns=["event_type", "value"])

    def q(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy())
        p50, p95 = (quantile_cont(v, 0.5), quantile_cont(v, 0.95))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "p50_value": [np.floor(p50 * 1e6) / 1e6],
            "p95_value": [np.floor(p95 * 1e6) / 1e6],
            "n": np.array([len(v)], dtype="int64")})

    return (ds.groupby("event_type").map_groups(q, batch_format="pandas")
            .sort("event_type"))


def kll_quantiles_chunked(sf_dir: str, k: int = 8, chunk_size: int = 64,
                          n_buckets: int = 16) -> pd.DataFrame:
    """Corpus-level KLL quantiles with DATA-DEFINED merge structure —
    the DuckDB-ORACLED sketch surface (VERDICT r4 #8).

    ``approx_value_percentiles`` is rows-only-checkable because its
    partials follow Ray's batch boundaries; here every boundary is a
    function of the data: chunk = event_id // chunk_size, bucket =
    chunk % n_buckets, and the merge tree is chunk → bucket → global.
    ``kll_compress`` is MULTISET-deterministic (every compaction sorts
    the level it compacts and the deterministic offset depends only on
    level + count), so each phase — and therefore the whole tree — is
    reproducible from the data alone, and the oracle replays all three
    compress phases as recursive CTEs plus the weighted-rank query.

    Scale shape: one bucket shuffle of (bucket, chunk, value) slim
    rows, per-bucket chunk sketches + one in-task merge, then a
    driver fold over ≤ n_buckets × ~caps_sum sketch rows (bounded by
    the knobs, not the data).  At 100 TB raise chunk_size (the
    per-chunk python call amortizes) and n_buckets.
    """
    ds = read(sf_dir, "events", columns=["event_id", "value"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["value"])
        chunk = df["event_id"].to_numpy(np.int64) // chunk_size
        return pd.DataFrame({
            "_bk": (chunk % n_buckets).astype("int64"),
            "chunk": chunk.astype("int64"),
            "value": df["value"].to_numpy(np.float64)})

    def bucket_sketch(g: pd.DataFrame) -> pd.DataFrame:
        vs, ls = [], []
        for _, srs in g.groupby("chunk", sort=False)["value"]:
            v, l = kll_partial(srs.to_numpy(), k)
            vs.append(v)
            ls.append(l)
        v, l = kll_merge(np.concatenate(vs), np.concatenate(ls), k)
        return pd.DataFrame({"_v": v, "_l": l.astype("int64")})

    parts = (ds.map_batches(tag, batch_format="pandas")
             .groupby("_bk").map_groups(
                 lambda g: bucket_sketch(g.drop(columns=["_bk"])),
                 batch_format="pandas"))
    pdf = parts.to_pandas()       # ≤ n_buckets × ~35 rows — knob-bounded
    fv, fl = kll_merge(pdf["_v"].to_numpy(),
                       pdf["_l"].to_numpy().astype(np.uint8), k)
    row = {f"p{int(q * 100)}": kll_quantile(fv, fl, q)
           for q in (0.25, 0.5, 0.75, 0.9)}
    row["n_est"] = int(kll_weight(fl).sum())
    return pd.DataFrame([row])


def approx_value_percentiles(sf_dir: str, k: int = 200):
    """KLL-sketched per-group percentiles — the 100-TB shape for
    per-key quantiles at UNBOUNDED key cardinality: the shuffle
    carries at most the sketch rows (~3k float64s) per (event_type,
    batch) instead of the whole group, unlike ``value_percentiles``
    which documents its bounded-group assumption.  Deterministic
    compaction → stable rows; the rank-error bound lives in
    ``test_temporal.py``."""
    ds = read(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, s in df.groupby("event_type", sort=False)["value"]:
            v, l = kll_partial(s.to_numpy(), k)
            outs.append(pd.DataFrame({
                "event_type": et, "_v": v, "_l": l.astype("int64")}))
        return (pd.concat(outs, ignore_index=True) if outs else
                pd.DataFrame({"event_type": pd.Series([], dtype=object),
                              "_v": pd.Series([], dtype="float64"),
                              "_l": pd.Series([], dtype="int64")}))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        v, l = kll_merge(g["_v"].to_numpy(),
                         g["_l"].to_numpy().astype(np.uint8), k)
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "p50_est": [kll_quantile(v, l, 0.5)],
            "p95_est": [kll_quantile(v, l, 0.95)],
            "n_est": np.array([kll_weight(l).sum()], dtype="int64")})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type")
            .map_groups(finalize, batch_format="pandas")
            .sort("event_type"))


def overlap_join(points, intervals, *, on: str, start: str, end: str,
                 chunk_us: int = 6 * 3600 * 1_000_000,
                 buckets: int = 64):
    """General interval OVERLAP join (``start <= on < end``) for
    intervals that MAY overlap — closing ``interval_join``'s
    documented non-overlapping limit.  Time is cut into fixed
    ``chunk_us`` chunks: each interval replicates to every chunk it
    overlaps (flat vectorized expansion, O(length/chunk) copies —
    pick ``chunk_us`` near the median interval length), each point
    lands in exactly ONE chunk, so every qualifying (point, interval)
    pair is produced exactly once with no dedup pass.  One chunk-hash
    bucket union shuffle; a bucket merges ALL its chunks in one
    pandas ``merge(on=chunk)`` (the `_block_buckets` rule) and the
    containment predicate filters vectorized.  Returns
    (point id cols ∪ interval id cols) minus the internal chunk/side
    columns."""

    def prep_points(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        us = df[on].astype("datetime64[us]").astype("int64")
        df["_us"] = us
        df["_chunk"] = us // chunk_us
        return df.drop(columns=[on])

    def prep_intervals(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        s = df[start].astype("datetime64[us]").astype("int64")
        e = df[end].astype("datetime64[us]").astype("int64")
        c0 = s // chunk_us
        c1 = (e - 1) // chunk_us
        reps = (c1 - c0 + 1).to_numpy()
        total = int(reps.sum())
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        out = df.drop(columns=[start, end]).iloc[
            np.repeat(np.arange(len(df)), reps)].copy()
        out["_s"] = np.repeat(s.to_numpy(), reps)
        out["_e"] = np.repeat(e.to_numpy(), reps)
        out["_chunk"] = (np.repeat(c0.to_numpy(), reps)
                         + (np.arange(total) - starts))
        return out

    pts = points.map_batches(prep_points, batch_format="pyarrow")
    ivs = intervals.map_batches(prep_intervals, batch_format="pyarrow")
    p_cols = [c for c in pts.schema().names if c not in ("_us", "_chunk")]
    i_cols = [c for c in ivs.schema().names
              if c not in ("_s", "_e", "_chunk")]

    def pad(df: pd.DataFrame, side: int) -> pd.DataFrame:
        df = df.copy()
        df["_side"] = side
        for c in ("_us", "_s", "_e"):
            if c not in df.columns:
                df[c] = np.int64(-1)
        for c in p_cols + i_cols:
            if c not in df.columns:
                df[c] = np.int64(-1)
        with np.errstate(over="ignore"):
            h = (df["_chunk"].to_numpy().astype("uint64")
                 * np.uint64(0x9E3779B97F4A7C15))
        df["_b"] = (h % np.uint64(buckets)).astype("int64")
        cols = ["_b", "_side", "_chunk", "_us", "_s", "_e"] + p_cols + i_cols
        return df[cols]

    tagged = (pts.map_batches(lambda df: pad(df, 0),
                              batch_format="pandas")
              .union(ivs.map_batches(lambda df: pad(df, 1),
                                     batch_format="pandas")))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["_side"] == 0][["_chunk", "_us"] + p_cols]
        iv = g[g["_side"] == 1][["_chunk", "_s", "_e"] + i_cols]
        m = p.merge(iv, on="_chunk")
        keep = ((m["_us"].to_numpy() >= m["_s"].to_numpy())
                & (m["_us"].to_numpy() < m["_e"].to_numpy()))
        return m[keep][p_cols + i_cols].reset_index(drop=True)

    return tagged.groupby("_b").map_groups(
        lambda g: join_bucket(g.drop(columns=["_b"])),
        batch_format="pandas")


def campaign_attribution(sf_dir: str, n_campaigns: int = 250,
                         buckets: int = 64):
    """Events joined to OVERLAPPING campaign windows (250 deterministic
    8-hour windows starting every 3 hours from 2024-01-01 — overlap
    factor ≈ 2.7, the case ``interval_join`` cannot handle).  Exercises
    ``overlap_join``; the tiny interval table is built driver-side
    (bounded, like every broadcast prep)."""
    import ray.data as rd

    ev = read(sf_dir, "events", columns=["event_id", "ts"])
    base = pd.Timestamp("2024-01-01")
    iv = pd.DataFrame({
        "interval_id": np.arange(n_campaigns, dtype="int64"),
        "start_ts": base + pd.to_timedelta(
            3 * np.arange(n_campaigns), unit="h"),
        "end_ts": base + pd.to_timedelta(
            3 * np.arange(n_campaigns) + 8, unit="h")})
    return (overlap_join(ev, rd.from_pandas(iv), on="ts",
                         start="start_ts", end="end_ts",
                         buckets=buckets)
            .sort(["event_id", "interval_id"]))


def hll_registers(sf_dir: str, p: int = 12):
    """HyperLogLog register table per event_type (Flajolet et al.
    2007): the FIXED-size (2^p registers) mergeable distinct-count
    state, exposed as sparse (event_type, idx, rnk) integer rows so the
    DuckDB oracle can replay it hash-exactly (splitmix64 in SQL + the
    BIT-string leading-zeros trick; the float estimator lives in
    ``hll_distinct_users`` and is pytest-gated instead, because libm
    ``ln`` differs from DuckDB's in the last ulp).

    Shape at 100 TB: each batch contributes ≤ min(distinct_users,
    2^p) register rows per event_type — bounded combiner state like
    KMV/KLL — and the global merge is a register-wise max per bounded
    (type, idx) key space (≤ types · 2^p rows ever shuffled)."""
    from address_address_matching_ray.functions.sketch import hll_partial

    ds = read(sf_dir, "events", columns=["event_type", "user_id"])
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, g in df.groupby("event_type", sort=False):
            regs = hll_partial(
                hash_values(g["user_id"].to_numpy()), p)
            nz = np.flatnonzero(regs)
            out.append(pd.DataFrame({
                "event_type": et, "idx": nz.astype("int64"),
                "rnk": regs[nz].astype("int64")}))
        return (pd.concat(out, ignore_index=True) if out else
                pd.DataFrame({"event_type": pd.Series([], dtype=object),
                              "idx": pd.Series([], dtype="int64"),
                              "rnk": pd.Series([], dtype="int64")}))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype="int64")
        np.maximum.at(regs, g["idx"].to_numpy(), g["rnk"].to_numpy())
        nz = np.flatnonzero(regs)
        return pd.DataFrame({"event_type": g["event_type"].iloc[0],
                             "idx": nz.astype("int64"),
                             "rnk": regs[nz]})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type").map_groups(merge,
                                              batch_format="pandas")
            .sort(["event_type", "idx"]))


def hll_distinct_users(sf_dir: str, p: int = 12):
    """COUNT(DISTINCT user_id) per event_type via the HLL registers —
    the fixed-2^p-byte-state alternative to the KMV surface
    (``approx_distinct_users``); error ~ 1.04/sqrt(2^p).  Estimator
    accuracy and merge associativity are pytest-gated
    (``test_temporal``)."""
    from address_address_matching_ray.functions.sketch import hll_estimate

    m = 1 << p

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype="uint8")
        regs[g["idx"].to_numpy()] = g["rnk"].to_numpy().astype("uint8")
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_users_est": [hll_estimate(regs, p)]})

    return (hll_registers(sf_dir, p)
            .groupby("event_type").map_groups(finalize,
                                              batch_format="pandas")
            .sort("event_type"))
