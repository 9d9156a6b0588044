"""Permanent full-sweep oracle gate (VERDICT r4 item #2).

The driver's CORRECTNESS file only covers a 50-query window, so the
other ~66 registered surfaces had no standing driver-side check.  This
module parametrizes over EVERY ``oracle_sql()`` entry and replays the
driver's comparison at sf0.001: row count, sorted-column schema, and a
value hash (columns sorted by name, rows sorted, floats rounded to
1e-9, ``pd.util.hash_pandas_object`` md5 per column) — the exact
semantics of the round-4 local gate replica that matched the driver.

A regression in any oracled surface (e.g. ``cluster_eval``) now fails
pytest even when the driver's window doesn't reach it.
"""

import hashlib
import time

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
# per-query wall budget: generous vs the observed ≤5 s at sf0.001 on
# 4 CPUs, tight enough to flag an accidental O(n²) or full rescan
BUDGET_SEC = 120


def _entry():
    import __ray_entry__ as e

    return e


ORACLED = sorted(set(_entry().queries()) & set(_entry().oracle_sql()))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True))


def _vhash(df: pd.DataFrame) -> str:
    df = _canon(df)
    h = hashlib.md5()
    for c in df.columns:
        v = df[c]
        if np.issubdtype(v.dtype, np.floating):
            v = v.round(9)
        h.update(pd.util.hash_pandas_object(v, index=False)
                 .values.tobytes())
    return h.hexdigest()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_sweep(name, con, ray_session):
    e = _entry()
    t0 = time.time()
    got = e.queries()[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    elapsed = time.time() - t0
    want = con.execute(e.oracle_sql()[name]).fetchdf()
    assert len(got) == len(want), (
        f"{name}: rows {len(got)} vs oracle {len(want)}")
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: schema {sorted(got.columns)} vs {sorted(want.columns)}")
    if _vhash(got) != _vhash(want):
        gc, wc = _canon(got), _canon(want)
        neq = [c for c in gc.columns
               if not gc[c].reset_index(drop=True).equals(
                   wc[c].reset_index(drop=True))]
        raise AssertionError(
            f"{name}: value-hash mismatch in columns {neq}\n"
            f"got:\n{gc.head(5)}\nwant:\n{wc.head(5)}")
    assert elapsed < BUDGET_SEC, (
        f"{name}: {elapsed:.1f}s exceeds the {BUDGET_SEC}s sf0.001 budget")
