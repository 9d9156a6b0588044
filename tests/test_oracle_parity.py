"""Local parity gates for the round-4 oracle-conversion surfaces.

Each test runs a queries() entry next to its oracle_sql() in DuckDB at
sf0.001 and asserts exact value equality (the driver's check, but in
pytest so a regression is caught before a driver round).  These cover
the conversions that made pseudo-randomness / float reductions
SQL-replayable: splitmix64-in-SQL, integer micro-unit reduces, and
hash-derived hyperplanes.
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("customer", "events", "embeddings", "orders", "lineitem")

CONVERTED = [
    "approx_distinct_users",   # splitmix64 KMV replayed in SQL
    "embedding_kmeans",        # integer micro-unit Lloyd CTEs
    "semantic_dedup",          # keep rule over the k-means assignment
    "fs_em_weights",           # 10 Winkler-EM rounds unrolled
    "ann_lsh_topk",            # hash-derived hyperplanes + probe masks
    "ann_ivf_topk",            # micro-unit codebook + probe/rerank
    "embedding_dedup",         # banded hyperplane blocking + CC
    "pagerank",                # integer power iteration, unrolled CTEs
]


@pytest.fixture(scope="module")
def entry_mod():
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", CONVERTED)
def test_oracle_parity(name, entry_mod, con, ray_session):
    got = entry_mod.queries()[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False, check_exact=True, check_column_type=False)
