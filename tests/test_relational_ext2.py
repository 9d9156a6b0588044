"""Round-4 second extension batch: rollup, moments stats, rank windows,
full-outer join, set intersection, JSON extraction, discrete order
statistics, TF-IDF, bigrams, URL host analytics — each pinned against a
DuckDB oracle at sf0.001 (the same comparison the driver runs at
sf0.01)."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("events", "documents", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_revenue_rollup_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        revenue_rollup,
    )

    got = revenue_rollup(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*)::BIGINT AS n_rows
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY 1, 2""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    grand = got[got["l_returnflag"] == "ALL"]
    assert len(grand) == 1
    assert grand["n_rows"].iloc[0] == got[
        (got["l_returnflag"] != "ALL") & (got["l_linestatus"] != "ALL")
    ]["n_rows"].sum()


def test_value_stats_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import value_stats

    got = value_stats(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT event_type, count(*)::BIGINT AS n_events,
               round(avg(value), 6) AS avg_value,
               round(var_samp(value), 6) AS var_value,
               round(stddev_samp(value), 6) AS std_value,
               min(value) AS min_value, max(value) AS max_value
        FROM events GROUP BY event_type ORDER BY event_type""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)


def test_window_ranks_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import window_ranks

    got = window_ranks(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT event_id, event_type, floor(value)::BIGINT AS vb,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               percent_rank() OVER w AS pct_rank,
               ntile(4) OVER (PARTITION BY event_type
                              ORDER BY floor(value)::BIGINT, event_id)
                   AS tile4
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY floor(value)::BIGINT)
        ORDER BY event_type, vb, event_id""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    # real ties exist → rank and dense_rank diverge somewhere
    assert (got["rnk"] != got["drnk"]).any()


def test_daily_user_activity_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        daily_user_activity,
    )

    got = daily_user_activity(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        WITH c AS (
          SELECT user_id,
                 floor(epoch(date_trunc('day', ts)) / 86400)::BIGINT AS day_id,
                 sum(value) AS click_value
          FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        p AS (
          SELECT user_id,
                 floor(epoch(date_trunc('day', ts)) / 86400)::BIGINT AS day_id,
                 sum(value) AS purchase_value
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT coalesce(c.user_id, p.user_id) AS user_id,
               coalesce(c.day_id, p.day_id) AS day_id,
               round(coalesce(click_value, 0), 4) AS click_value,
               round(coalesce(purchase_value, 0), 4) AS purchase_value
        FROM c FULL OUTER JOIN p
          ON c.user_id = p.user_id AND c.day_id = p.day_id
        ORDER BY 1, 2""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    # genuine outer rows on both sides
    assert (got["click_value"] == 0).any()
    assert (got["purchase_value"] == 0).any()


def test_returning_users_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        returning_users,
    )

    got = returning_users(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT user_id FROM events
        WHERE ts < TIMESTAMP '2024-01-04'
        INTERSECT
        SELECT user_id FROM events
        WHERE ts >= TIMESTAMP '2024-01-28'
        ORDER BY user_id""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0


def test_props_extract_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        props_extract,
    )

    got = props_extract(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT event_type, count(*)::BIGINT AS n_events,
               round(avg(json_extract(props, '$.k')::BIGINT), 6) AS avg_k,
               max(json_extract(props, '$.k')::BIGINT) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)


def test_value_median_mode_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        value_median_mode,
    )

    got = value_median_mode(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT q.event_type, q.n_events, q.median_disc, q.p90_disc,
               md.mode_vb
        FROM (SELECT event_type, count(*)::BIGINT AS n_events,
                     quantile_disc(value, 0.5) AS median_disc,
                     quantile_disc(value, 0.9) AS p90_disc
              FROM events GROUP BY 1) q
        JOIN (SELECT event_type, vb AS mode_vb FROM (
                SELECT event_type, floor(value)::BIGINT AS vb,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY count(*) DESC, vb) AS rn
                FROM events GROUP BY 1, 2) WHERE rn = 1) md
          USING (event_type)
        ORDER BY event_type""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)


def test_tfidf_top_terms_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import read
    from address_address_matching_ray.pipelines.text import tfidf_top_terms

    docs = read(SF, "documents", columns=["doc_id", "text"])
    got = tfidf_top_terms(docs).to_pandas().reset_index(drop=True)
    exp = _con().execute(r"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                    x -> x <> '')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        s AS (SELECT tf.doc_id, tf.term,
                     round(tf.tf * ln(n.n / df.df), 6) AS score,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY round(tf.tf * ln(n.n / df.df), 6) DESC,
                                tf.term) AS rank
              FROM tf, df, n WHERE tf.term = df.term)
        SELECT doc_id, term, score, CAST(rank AS BIGINT) AS rank
        FROM s WHERE rank <= 3 ORDER BY doc_id, rank""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)


def test_bigram_counts_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import read
    from address_address_matching_ray.pipelines.text import bigram_counts

    docs = read(SF, "documents", columns=["text"])
    got = bigram_counts(docs).to_pandas().reset_index(drop=True)
    exp = _con().execute(r"""
        WITH t AS (
          SELECT list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents),
        b AS (SELECT unnest([toks[i] || ' ' || toks[i+1]
                             for i in range(1, len(toks))]) AS bigram
              FROM t)
        SELECT bigram, count(*)::BIGINT AS n FROM b
        GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)


def test_host_page_counts_oracle(ray_session):
    import pyarrow.parquet as pq

    from address_address_matching_ray.pipelines.text import host_page_counts
    from address_address_matching_ray.sources.synth import pages_batch

    n = 2_000
    pages = pages_batch(np.arange(n), 42).select(["url", "html"])
    path = "/tmp/graft_test_hosts.parquet"
    pq.write_table(pages, path)
    import ray.data as rd
    got = (host_page_counts(rd.read_parquet(path))
           .to_pandas().reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
               count(*)::BIGINT AS n_pages,
               sum(octet_length(html))::BIGINT AS html_bytes
        FROM read_parquet('{path}')
        GROUP BY 1 ORDER BY n_pages DESC, host LIMIT 20""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)


def test_equi_join_outer_matches_duckdb(ray_session):
    import ray.data as rd

    from address_address_matching_ray.pipelines.join import equi_join

    rng = np.random.default_rng(11)
    l = pd.DataFrame({"k": rng.integers(0, 50, 80),
                      "lv": rng.integers(0, 1000, 80).astype("int64")})
    r = pd.DataFrame({"k": rng.integers(25, 75, 60),
                      "rv": rng.integers(0, 1000, 60).astype("int64")})
    got = (equi_join(rd.from_pandas(l), rd.from_pandas(r),
                     on="k", how="outer", buckets=8)
           .to_pandas().sort_values(["k", "lv", "rv"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    exp = con.execute("""
        SELECT coalesce(l.k, r.k) AS k, lv::DOUBLE AS lv, rv::DOUBLE AS rv
        FROM l FULL OUTER JOIN r ON l.k = r.k
        ORDER BY k, lv, rv""").fetchdf()
    exp["k"] = exp["k"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
    assert got["lv"].isna().any() and got["rv"].isna().any()
