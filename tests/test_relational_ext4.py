"""Round-4 fourth extension batch: grouped z-score normalization,
robust median/MAD stats, deterministic hash-Bernoulli sampling —
DuckDB-oracled at sf0.001 plus degenerate-input checks."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _oracle(name):
    import __ray_entry__ as e

    return _con().execute(e.oracle_sql()[name]).fetchdf()


def test_value_zscore_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        value_zscore,
    )

    got = value_zscore(SF).to_pandas()
    exp = _oracle("value_zscore").astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))
    # standardized column must actually be standardized
    z = got.groupby("event_type")["z_value"]
    assert (z.mean().abs() < 1e-3).all()
    assert ((z.std() - 1).abs() < 1e-2).all()


def test_value_mad_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import value_mad

    got = value_mad(SF).to_pandas()
    exp = _oracle("value_mad").astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))
    assert (got["mad_value"] >= 0).all()


def test_hash_sample_oracle_and_determinism(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        hash_sample,
    )

    got = hash_sample(SF).to_pandas()
    exp = _oracle("hash_sample").astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))
    again = hash_sample(SF).to_pandas()
    pd.testing.assert_frame_equal(got, again)  # no RNG state anywhere
    # rate lands near 10% (hash uniformity, 500 docs)
    assert 0.04 <= len(got) / 500 <= 0.16


def test_value_zscore_single_row_group(ray_session):
    """A group of size 1 has undefined sample stddev: z must be
    NaN/NULL on both sides, not a crash or an inf."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.relational import (
        value_zscore,
    )
    import address_address_matching_ray.pipelines.relational as rel

    ev = pd.DataFrame({"event_id": [1, 2, 3],
                       "event_type": ["a", "a", "solo"],
                       "value": [1.0, 3.0, 7.0]})
    orig = rel.read
    try:
        rel.read = lambda sf, t, columns=None: rd.from_pandas(ev[columns])
        got = value_zscore("ignored").to_pandas().set_index("event_id")
    finally:
        rel.read = orig
    assert np.isnan(got.loc[3, "z_value"])
    assert abs(got.loc[2, "z_value"] - round((3 - 2) / np.sqrt(2), 6)) < 1e-9
