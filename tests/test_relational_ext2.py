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


def test_moving_avg_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import moving_avg

    got = moving_avg(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT user_id, event_id,
               CAST(row_number() OVER w AS BIGINT) AS row_no,
               round(avg(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN 3 PRECEDING
                                      AND CURRENT ROW), 6) AS mov_avg,
               first_value(value) OVER w AS first_v
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, row_no""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    # row 1 of every user: moving avg over one row == first value
    first = got[got["row_no"] == 1]
    assert np.allclose(first["mov_avg"], first["first_v"].round(6))


def test_doc_unigram_logprob_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import read
    from address_address_matching_ray.pipelines.text import (
        doc_unigram_logprob,
    )

    docs = read(SF, "documents", columns=["doc_id", "text"])
    got = doc_unigram_logprob(docs).to_pandas().reset_index(drop=True)
    exp = _con().execute(r"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                    x -> x <> '')) AS term
          FROM documents),
        freq AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        total AS (SELECT sum(cnt)::DOUBLE AS n FROM freq)
        SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
               round(avg(-ln(freq.cnt / total.n)), 6) AS xent
        FROM tok, freq, total WHERE tok.term = freq.term
        GROUP BY tok.doc_id ORDER BY tok.doc_id""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    assert (got["xent"] > 0).all()


def test_url_canonicalization_sql_matches_python_spec():
    """The url_dedup oracle's regex/list chain must equal the Python
    spec (stages.keys.canonical_url) — adversarial cases included."""
    import duckdb as dd

    from address_address_matching_ray.sources.synth import pages_batch
    from address_address_matching_ray.stages.keys import canonical_url

    urls = pages_batch(np.arange(3000), 42)["url"].to_pylist()
    urls += ["", "  http://WWW.Ex.com//a//b///?utm_source=x&b=2&a=1#frag",
             "https://ex.com/?ref=z", "ex.com/path/", "http://ex.com",
             "http://ex.com/?=bad&a=1&&b=2", "HTTPS://A.B/p?gclid=1",
             "http://ex.com/p?zz=1&aa=2&mm=3", "http://ex.com/#only",
             "http://ex.com/p?UTM_SOURCE=a", "www.ex.com"]
    exp = [canonical_url(u) for u in urls]
    con = dd.connect()
    con.register("u", pd.DataFrame({"url": urls}))
    got = con.execute(r"""
        WITH s AS (
          SELECT url, regexp_replace(regexp_replace(trim(url),
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''), '#.*$', '') AS x
          FROM u),
        parts AS (
          SELECT url,
            CASE WHEN position('?' IN x) > 0
                 THEN substr(x, 1, position('?' IN x) - 1) ELSE x END AS base,
            CASE WHEN position('?' IN x) > 0
                 THEN substr(x, position('?' IN x) + 1) ELSE '' END AS query
          FROM s),
        hp AS (
          SELECT url, query,
            regexp_replace(lower(regexp_extract(base, '^([^/]*)', 1)),
                           '^www\.', '') AS host,
            '/' || CASE WHEN position('/' IN base) > 0
                        THEN substr(base, position('/' IN base) + 1)
                        ELSE '' END AS path0
          FROM parts),
        cp AS (
          SELECT url, host, query,
            CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
                 ELSE regexp_replace(path0, '/+$', '') END AS path
          FROM hp),
        kq AS (
          SELECT url, host, path,
            array_to_string(list_sort(list_filter(string_split(query, '&'),
              p -> regexp_extract(p, '^([^=]*)', 1) <> ''
                   AND NOT regexp_matches(regexp_extract(p, '^([^=]*)', 1),
                        '^(utm_[a-z]+|ref|fbclid|gclid|mc_cid|mc_eid)$',
                        'i'))), '&') AS q
          FROM cp)
        SELECT CASE WHEN trim(url) = '' THEN ''
                    ELSE host || path ||
                         CASE WHEN q <> '' THEN '?' || q ELSE '' END
               END AS curl
        FROM kq""").fetchdf()["curl"].tolist()
    assert got == exp


def test_url_dedup_oracle(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from address_address_matching_ray.pipelines.dedup import url_dedup
    from address_address_matching_ray.sources.synth import pages_batch
    from address_address_matching_ray.stages.keys import canonical_url

    n = 3_000
    pages = pages_batch(np.arange(n), 42).select(["doc_id", "url"])
    path = "/tmp/graft_test_urldedup.parquet"
    pq.write_table(pages, path)
    got = url_dedup(rd.read_parquet(path)).to_pandas().reset_index(drop=True)
    # oracle: python spec canonicalization + pandas dedup semantics
    df = pages.to_pandas()
    df["curl"] = df["url"].map(canonical_url)
    exp = (df.groupby("curl", as_index=False)
           .agg(keep_id=("doc_id", "min"), n_pages=("doc_id", "size")))
    exp["n_pages"] = exp["n_pages"].astype("int64")
    exp = exp.sort_values("curl").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert (got["n_pages"] > 1).any()      # real recrawl collapses


def test_embedding_norms_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import read
    from address_address_matching_ray.pipelines.similarity import (
        embedding_norms,
    )

    emb = read(SF, "embeddings", columns=["vec_id", "embedding"])
    got = embedding_norms(emb).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    exp = con.execute("""
        SELECT vec_id, len(embedding)::BIGINT AS dim,
               round(sqrt(list_sum(list_transform(
                 embedding, x -> x::DOUBLE * x::DOUBLE))), 6) AS l2_norm
        FROM embeddings ORDER BY vec_id""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)


def test_label_centroids_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import read
    from address_address_matching_ray.pipelines.similarity import (
        label_centroids,
    )

    emb = read(SF, "embeddings", columns=["label", "embedding"])
    got = label_centroids(emb).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    exp = con.execute("""
        WITH e AS (
          SELECT label::BIGINT AS label,
                 unnest(range(len(embedding)))::BIGINT AS dim_j,
                 unnest(list_transform(embedding, x -> x::DOUBLE)) AS v
          FROM embeddings)
        SELECT label, dim_j, count(*)::BIGINT AS n_vecs,
               round(avg(v), 6) + 0.0 AS mean_val
        FROM e GROUP BY 1, 2 ORDER BY 1, 2""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    # every label covers the full dim range
    assert (got.groupby("label")["dim_j"].count()
            == got["dim_j"].max() + 1).all()


def test_event_correlations_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        event_correlations,
    )

    got = event_correlations(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT event_type, count(*)::BIGINT AS n_events,
               round(covar_samp(value,
                     json_extract(props, '$.k')::BIGINT), 6) + 0.0 AS covar,
               round(corr(value,
                     json_extract(props, '$.k')::BIGINT), 6) + 0.0
                   AS corr_vk
        FROM events GROUP BY event_type ORDER BY event_type""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    assert (got["corr_vk"].abs() <= 1.0).all()


def test_new_ops_empty_and_edge_inputs(ray_session):
    """Degenerate-input behavior: the full-outer join with one empty
    side, url_dedup on an empty table, bigrams on 1-token docs."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.dedup import url_dedup
    from address_address_matching_ray.pipelines.join import equi_join
    from address_address_matching_ray.pipelines.text import bigram_counts

    l = pd.DataFrame({"k": np.arange(5, dtype="int64"),
                      "lv": np.arange(5, dtype="int64")})
    r = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                      "rv": pd.Series([], dtype="int64")})
    out = (equi_join(rd.from_pandas(l), rd.from_pandas(r),
                     on="k", how="outer", buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == list(range(5))
    assert out["rv"].isna().all()

    empty_pages = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "url": pd.Series([], dtype=object)}))
    assert url_dedup(empty_pages).count() == 0

    one_tok = rd.from_pandas(pd.DataFrame({
        "text": ["single", "", "two words"]}))
    bg = bigram_counts(one_tok).to_pandas().reset_index(drop=True)
    assert bg["bigram"].tolist() == ["two words"]


def test_tfidf_and_logprob_join_path_parity(ray_session):
    """VERDICT r4 item #1: the >max_vocab bucketed-join attach must be
    bit-identical to the broadcast path.  Forcing ``max_vocab=100``
    takes the join path through the gate itself (sf0.001 vocab is far
    larger), and ``force_join=True`` exercises the explicit override;
    both must reproduce the broadcast-path rows exactly."""
    from address_address_matching_ray.pipelines.relational import read
    from address_address_matching_ray.pipelines.text import (
        doc_unigram_logprob,
        tfidf_top_terms,
    )

    def docs():
        return read(SF, "documents", columns=["doc_id", "text"])

    base = tfidf_top_terms(docs()).to_pandas().reset_index(drop=True)
    gated = (tfidf_top_terms(docs(), max_vocab=100)
             .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(base, gated[base.columns])
    forced = (tfidf_top_terms(docs(), force_join=True)
              .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(base, forced[base.columns])

    xb = doc_unigram_logprob(docs()).to_pandas().reset_index(drop=True)
    xg = (doc_unigram_logprob(docs(), max_vocab=100)
          .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(xb, xg[xb.columns])
