"""Round-4 relational/text extensions: window functions, grouped
string_agg paths, pivot, and Gopher-style repetition stats — each
pinned against a DuckDB oracle at sf0.001 (the same comparison the
driver runs at sf0.01)."""

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


def test_window_functions_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        window_functions,
    )

    got = window_functions(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT user_id, event_id,
               CAST(row_number() OVER w AS BIGINT) AS row_no,
               round(sum(value) OVER w, 2) AS cum_value,
               value - coalesce(lag(value) OVER w, value) AS delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, row_no""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    # first row of every user has delta exactly 0
    assert (got.loc[got["row_no"] == 1, "delta"] == 0.0).all()


def test_user_paths_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import user_paths

    got = user_paths(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
               count(*)::BIGINT AS n_events
        FROM events GROUP BY user_id ORDER BY user_id""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    assert (got["path"].str.count(">") + 1 == got["n_events"]).all()


def test_event_type_pivot_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        event_type_pivot,
    )

    got = event_type_pivot(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT user_id,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
               sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view,
               count(*)::BIGINT AS n_total
        FROM events GROUP BY user_id ORDER BY user_id""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    assert (got[[c for c in got.columns
                 if c.startswith("n_") and c != "n_total"]]
            .sum(axis=1) == got["n_total"]).all()


def test_doc_repetition_oracle_and_edges(ray_session):
    import ray.data as rd

    from address_address_matching_ray.pipelines.relational import read
    from address_address_matching_ray.pipelines.text import doc_repetition

    docs = read(SF, "documents", columns=["doc_id", "text"])
    got = doc_repetition(docs).sort("doc_id").to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        WITH words AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
          FROM documents WHERE trim(text) <> ''),
        cnt AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w)
        SELECT doc_id, sum(c)::BIGINT AS n_words,
               round(1.0 - (count(*)::DOUBLE / sum(c)), 6) AS dup_word_frac,
               round(max(c)::DOUBLE / sum(c), 6) AS top_word_frac
        FROM cnt GROUP BY doc_id ORDER BY doc_id""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)

    # edge cases: empty, whitespace-only, all-same-word, all-distinct
    edge = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["", "   ", "x x x X", "a b c d"]}))
    e = (doc_repetition(edge).sort("doc_id")
         .to_pandas().reset_index(drop=True))
    assert e["doc_id"].tolist() == [2, 3]        # empties excluded
    assert e["n_words"].tolist() == [4, 4]
    assert e["dup_word_frac"].tolist() == [0.75, 0.0]
    assert e["top_word_frac"].tolist() == [1.0, 0.25]


def test_misra_gries_bound_and_merge():
    from address_address_matching_ray.functions import sketch as sk

    rng = np.random.default_rng(3)
    stream = rng.zipf(1.5, 200_000)
    stream = stream[stream < 10_000].astype(np.uint64)
    N, k = len(stream), 256
    keys = np.array([], dtype=np.uint64)
    counts = np.array([], dtype=np.int64)
    for i in range(0, N, 10_000):
        uk, uc = np.unique(stream[i:i + 10_000], return_counts=True)
        pk, pc = sk.mg_prune(uk, uc.astype(np.int64), k)
        keys, counts = sk.mg_merge(np.concatenate([keys, pk]),
                                   np.concatenate([counts, pc]), k)
    true_k, true_c = np.unique(stream, return_counts=True)
    bound = N / (k + 1)
    hot = true_k[true_c > bound]
    assert np.isin(hot, keys).all()              # no hot key lost
    est = dict(zip(keys.tolist(), counts.tolist()))
    for tk, tc in zip(true_k.tolist(), true_c.tolist()):
        e = est.get(tk, 0)
        assert e <= tc and tc - e <= bound       # one-sided bound

    # exact below capacity
    uk, uc = np.unique(stream[:5_000], return_counts=True)
    ek, ec = sk.mg_merge(uk, uc.astype(np.int64), k=100_000)
    assert np.array_equal(ek, uk) and np.array_equal(ec, uc)


def test_approx_word_frequencies_exact_below_capacity(ray_session):
    from address_address_matching_ray.pipelines.relational import read
    from address_address_matching_ray.pipelines.text import (
        approx_word_frequencies, word_frequencies,
    )

    docs = read(SF, "documents", columns=["text"])
    exact = word_frequencies(docs).to_pandas().reset_index(drop=True)
    approx = approx_word_frequencies(
        read(SF, "documents", columns=["text"]))
    pd.testing.assert_frame_equal(approx, exact)
