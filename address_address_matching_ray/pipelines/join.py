"""General scale-safe equi-join (SURVEY §2.4 J3 family).

``ray.data.Dataset.join`` (Ray 2.49's hash-join operator) spins up a
dedicated actor pool per join and pays ~10 s of fixed setup regardless
of input size — fine for one giant join, wrong for a pipeline of
medium ones.  This module provides the two shapes that dominate in
practice, both built from primitives the streaming executor pipelines
well:

- **broadcast join** (small build side): the build table is pulled
  once, ``ray.put`` once, and each probe batch does a vectorized
  pandas merge against the worker-cached copy — zero shuffle, zero
  extra operators.  Gated by an exact build-side row count.
- **bucketed shuffle join** (both sides large): both sides are tagged
  with the same ``hash(key) % buckets`` bucket id, unioned, and one
  ``groupby(_b).map_groups`` does a vectorized ``pd.merge`` per
  bucket — ONE all-to-all exchange, same machinery as
  ``temporal.asof_join`` (shared ``_pad_to`` union-schema helpers).

At 100 TB the broadcast path covers dim tables (region/nation/
customer-segment maps); fact-fact joins take the bucketed path where
buckets should be sized so one bucket's rows fit a task (~buckets >=
total_bytes / 512MB).  Skewed keys: salt upstream (see
``stages/keys.py`` hot-key salting) — an equi-join bucket is exactly
as skewed as its hottest key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from address_address_matching_ray.pipelines.temporal import (
    _fields_of, _pad_to,
)


def equi_join(left, right, *, on: str, right_on: str | None = None,
              how: str = "inner", buckets: int = 64,
              broadcast_threshold: int = 5_000_000):
    """Join two Datasets on an integer key.  Column names must be
    disjoint apart from the key; ``right_on`` defaults to ``on`` (when
    they differ, both key columns are kept, like pandas/DuckDB).

    ``how``: ``'inner'`` or ``'left'``.  Left joins widen right-side
    integer columns to float64 unconditionally so every bucket emits
    one block schema (the asof-join ADVICE lesson).

    Build side = ``right``; callers put the smaller table there.  Below
    ``broadcast_threshold`` build rows it is broadcast once and probed
    per batch (no shuffle); above, one bucketed union shuffle.
    """
    right_on = right_on or on
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}")

    n_right = right.count()
    if n_right <= broadcast_threshold:
        return _broadcast_join(left, right, on=on, right_on=right_on,
                               how=how)
    return _shuffle_join(left, right, on=on, right_on=right_on,
                         how=how, buckets=buckets)


def _widen_right_ints(out: pd.DataFrame, right_cols: list[str],
                      restore: dict[str, np.dtype], how: str,
                      on: str) -> pd.DataFrame:
    """Post-merge dtype policy: left columns return to their exact
    dtypes (null-free by construction); right columns also do under
    ``inner``, but under ``left`` integer right columns stay float64
    in EVERY bucket so block schemas never diverge."""
    for c, dt in restore.items():
        if c not in out.columns:
            continue
        if c in right_cols and c != on and how == "left":
            out[c] = out[c].astype(np.float64)
        else:
            out[c] = out[c].astype(dt)
    return out


def _broadcast_join(left, right, *, on: str, right_on: str, how: str):
    import ray

    from address_address_matching_ray.stages.bcast import get_cached

    rdf = right.to_pandas()
    ref = ray.put(rdf)
    restore_right = {c: rdf[c].dtype for c in rdf.columns
                     if np.issubdtype(rdf[c].dtype, np.integer)}

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        r = get_cached(ref)
        out = df.merge(r, how=how, left_on=on, right_on=right_on)
        for c, dt in restore_right.items():
            # same dtype policy as the shuffle path: left-join nulls
            # widen right ints to float64 in EVERY batch
            if how == "left" and c != on:
                out[c] = out[c].astype(np.float64)
            else:
                out[c] = out[c].astype(dt)
        return out

    return left.map_batches(probe, batch_format="pandas")


def _shuffle_join(left, right, *, on: str, right_on: str, how: str,
                  buckets: int):
    lf = _fields_of(left)
    rf = _fields_of(right)
    union_fields = lf + [(n, t) for n, t in rf if n not in
                         {n0 for n0, _ in lf}]
    left_cols = [n for n, _ in lf]
    right_cols = [n for n, _ in rf]
    restore = {n: np.dtype(t.to_pandas_dtype())
               for n, t in union_fields if pa.types.is_integer(t)}

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == 0, left_cols]
        r = g.loc[g["_side"] == 1, right_cols]
        for c in l.columns.intersection(restore):
            l[c] = l[c].astype(restore[c])
        for c in r.columns.intersection(restore):
            r[c] = r[c].astype(restore[c])
        out = l.merge(r, how=how, left_on=on, right_on=right_on)
        out = _widen_right_ints(out, right_cols, restore, how, on)
        return out.reset_index(drop=True)

    tagged = (left.map_batches(_pad_to(union_fields, 0, on, buckets),
                               batch_format="pyarrow")
              .union(right.map_batches(
                  _pad_to(union_fields, 1, right_on, buckets),
                  batch_format="pyarrow")))
    return tagged.groupby("_b").map_groups(
        lambda g: merge_bucket(g.drop(columns=["_b"])),
        batch_format="pandas")
