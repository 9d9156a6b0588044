"""Round-4 third extension batch: cross-document duplicate n-gram
coverage, the Gopher-style composite quality gate, funnel conversion and
cohort retention — each pinned against a DuckDB oracle at sf0.001 (the
same comparison the driver runs at sf0.01), plus degenerate-input and
semantic checks no SQL oracle covers."""

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


def _read_docs():
    from address_address_matching_ray.pipelines.relational import read

    return read(SF, "documents", columns=["doc_id", "text"])


def test_duplicate_ngram_coverage_oracle(ray_session):
    from address_address_matching_ray.pipelines.text import (
        duplicate_ngram_coverage,
    )

    got = (duplicate_ngram_coverage(_read_docs(), n=8)
           .to_pandas().reset_index(drop=True))
    exp = _con().execute("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        pos AS (
          SELECT doc_id, array_to_string(t[i:i+7], ' ') AS ng
          FROM toks, UNNEST(generate_series(1, len(t)-8+1)) AS u(i)
          WHERE len(t) >= 8),
        dup AS (SELECT ng FROM pos GROUP BY ng
                HAVING COUNT(DISTINCT doc_id) >= 2),
        per AS (SELECT p.doc_id, COUNT(*)::BIGINT AS n_pos,
                       COUNT(d.ng)::BIGINT AS n_dup
                FROM pos p LEFT JOIN dup d USING (ng) GROUP BY p.doc_id)
        SELECT doc.doc_id, COALESCE(per.n_pos, 0)::BIGINT AS n_pos,
               COALESCE(per.n_dup, 0)::BIGINT AS n_dup,
               COALESCE(per.n_dup, 0)::DOUBLE
                   / GREATEST(COALESCE(per.n_pos, 0), 1) AS dup_frac
        FROM documents doc LEFT JOIN per ON doc.doc_id = per.doc_id
        ORDER BY doc.doc_id""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    assert ((got["dup_frac"] >= 0) & (got["dup_frac"] <= 1)).all()


def test_duplicate_ngram_planted(ray_session):
    """A doc duplicated verbatim marks 100% of both copies' positions;
    a unique doc and a doc shorter than n stay at zero."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.text import (
        duplicate_ngram_coverage,
    )

    rng = np.random.default_rng(7)
    words = lambda k: " ".join(  # noqa: E731
        f"w{v}" for v in rng.integers(0, 50_000, size=k))
    dup = words(40)
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": [dup, dup, words(40), "a b c"]})
    out = (duplicate_ngram_coverage(rd.from_pandas(df), n=8, buckets=4)
           .to_pandas().set_index("doc_id"))
    assert out.loc[0, "dup_frac"] == 1.0 and out.loc[1, "dup_frac"] == 1.0
    assert out.loc[2, "dup_frac"] == 0.0
    assert out.loc[3, "n_pos"] == 0 and out.loc[3, "dup_frac"] == 0.0


def test_quality_filter_oracle(ray_session):
    from address_address_matching_ray.pipelines.text import quality_filter

    got = quality_filter(_read_docs()).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        WITH words AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
          FROM documents WHERE trim(text) <> ''),
        cnt AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
        rep AS (SELECT doc_id, sum(c)::BIGINT AS n_words,
                       round(1.0 - (count(*)::DOUBLE / sum(c)), 6)
                           AS dup_word_frac,
                       round(max(c)::DOUBLE / sum(c), 6) AS top_word_frac
                FROM cnt GROUP BY doc_id)
        SELECT * FROM rep
        WHERE n_words BETWEEN 30 AND 10000
          AND dup_word_frac <= 0.82 AND top_word_frac <= 0.12
        ORDER BY doc_id""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    # the gate must actually discriminate on this corpus
    n_docs = _con().execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(got) < n_docs


def test_funnel_conversion_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        funnel_conversion,
    )

    got = funnel_conversion(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        WITH f AS (SELECT user_id, min(ts) AS t0 FROM events
                   WHERE event_type = 'click' GROUP BY user_id),
        conv AS (SELECT DISTINCT e.user_id
                 FROM f JOIN events e ON e.user_id = f.user_id
                 WHERE e.event_type = 'purchase' AND e.ts > f.t0
                   AND e.ts <= f.t0 + INTERVAL 24 HOUR)
        SELECT 'all_users' AS stage,
               count(DISTINCT user_id)::BIGINT AS n_users FROM events
        UNION ALL SELECT 'click', count(*)::BIGINT FROM f
        UNION ALL SELECT 'click_then_purchase', count(*)::BIGINT FROM conv
        ORDER BY stage""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    n = got.set_index("stage")["n_users"]
    assert n["click_then_purchase"] <= n["click"] <= n["all_users"]


def test_funnel_window_semantics(ray_session):
    """Conversion must be strictly AFTER the first anchor event and
    inside the window: a purchase before the first click, or past the
    window, does not convert."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.relational import (
        funnel_conversion,
    )

    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 2, 2, 3, 3], dtype="int64"),
        "event_type": ["click", "purchase",     # converts (2h later)
                       "purchase", "click",     # purchase BEFORE click
                       "click", "purchase"],    # past the 24h window
        "ts": [t0, t0 + 2 * h, t0, t0 + h, t0, t0 + 30 * h]})
    df["ts"] = df["ts"].astype("datetime64[us]")
    import address_address_matching_ray.pipelines.relational as rel
    orig = rel.read
    try:
        rel.read = lambda sf, t, columns=None: rd.from_pandas(df[columns])
        out = (funnel_conversion("ignored", buckets=4)
               .to_pandas().set_index("stage")["n_users"])
    finally:
        rel.read = orig
    assert out["all_users"] == 3 and out["click"] == 3
    assert out["click_then_purchase"] == 1


def test_cohort_retention_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        cohort_retention,
    )

    got = cohort_retention(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        WITH firsts AS (
          SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
          FROM events GROUP BY user_id),
        act AS (SELECT DISTINCT e.user_id, f.cohort_day,
                       date_diff('day', f.cohort_day,
                                 date_trunc('day', e.ts)) AS day_offset
                FROM events e JOIN firsts f USING (user_id))
        SELECT cohort_day, day_offset, count(*)::BIGINT AS n_users
        FROM act GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    # day-0 retention counts every cohort member exactly once
    day0 = got[got["day_offset"] == 0].set_index("cohort_day")["n_users"]
    firsts = _con().execute("""
        SELECT date_trunc('day', min(ts)) AS d FROM events GROUP BY user_id
        """).fetchdf()["d"].value_counts()
    for d, n in day0.items():
        assert firsts[d] == n


def test_trailing_active_users_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        trailing_active_users,
    )

    got = trailing_active_users(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        WITH act AS (SELECT DISTINCT date_trunc('day', ts) AS d,
                            user_id FROM events),
        days AS (SELECT DISTINCT d FROM act)
        SELECT days.d AS day,
               count(DISTINCT act.user_id)::BIGINT AS active_users
        FROM days JOIN act
          ON act.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
        GROUP BY days.d ORDER BY days.d""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    # trailing actives can never fall below the single-day actives
    single = _con().execute("""
        SELECT date_trunc('day', ts) AS day,
               count(DISTINCT user_id)::BIGINT AS n
        FROM events GROUP BY 1 ORDER BY 1""").fetchdf()
    m = got.merge(single, on="day")
    assert (m["active_users"] >= m["n"]).all()


def test_novelty_filter_planted(ray_session):
    """Snapshot/new split with known overlap: only canonicals absent
    from the snapshot survive, and the new batch is deduped internally
    (min doc_id kept)."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.dedup import novelty_filter

    snap = pd.DataFrame({"url": [
        "https://a.com/x", "http://www.b.com/y/?utm_source=z"]})
    new = pd.DataFrame({
        "doc_id": np.arange(5, dtype="int64"),
        "url": ["https://A.com/x",          # in snapshot (host casefold)
                "http://b.com/y",            # in snapshot (www/utm/slash)
                "https://c.com/new",         # novel
                "https://c.com/new#frag",    # dup of 2 within new batch
                "https://d.com/other"]})     # novel
    out = (novelty_filter(rd.from_pandas(new), rd.from_pandas(snap),
                          buckets=4).to_pandas()
           .sort_values("curl").reset_index(drop=True))
    assert out["curl"].tolist() == ["c.com/new", "d.com/other"]
    assert out["keep_id"].tolist() == [2, 4]
    assert out["n_pages"].tolist() == [2, 1]


def test_latest_events_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import (
        latest_events,
    )

    got = latest_events(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute("""
        SELECT user_id, event_id, ts, event_type, value FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1 ORDER BY user_id""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    # exactly one row per user
    n_users = _con().execute(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert len(got) == n_users and got["user_id"].is_unique


def test_centroid_similarity_oracle(ray_session):
    from address_address_matching_ray.pipelines.relational import read
    from address_address_matching_ray.pipelines.similarity import (
        centroid_similarity,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    got = (centroid_similarity(
        read(SF, "embeddings", columns=["label", "embedding"]))
        .to_pandas().reset_index(drop=True))
    exp = con.execute("""
        WITH e AS (
          SELECT label::BIGINT AS label,
                 unnest(range(len(embedding)))::BIGINT AS dim_j,
                 unnest(list_transform(embedding, x -> x::DOUBLE)) AS v
          FROM embeddings),
        c AS (SELECT label, dim_j, round(avg(v), 6) + 0.0 AS m
              FROM e GROUP BY 1, 2),
        p AS (SELECT a.label AS label_a, b.label AS label_b,
                     sum(a.m * b.m) AS dot,
                     sqrt(sum(a.m * a.m)) AS na,
                     sqrt(sum(b.m * b.m)) AS nb
              FROM c a JOIN c b ON a.dim_j = b.dim_j AND a.label < b.label
              GROUP BY 1, 2)
        SELECT label_a, label_b, round(dot / (na * nb), 6) + 0.0 AS cosine
        FROM p ORDER BY label_a, label_b""").fetchdf()
    pd.testing.assert_frame_equal(got, exp)
    assert (got["cosine"].abs() <= 1.0 + 1e-9).all()
    # all unordered label pairs present exactly once
    n_labels = con.execute(
        "SELECT count(DISTINCT label) FROM embeddings").fetchone()[0]
    assert len(got) == n_labels * (n_labels - 1) // 2


def test_dedup_spans_oracle(ray_session):
    import __ray_entry__ as e

    got = e.queries()["dedup_spans"](SF).to_pandas()
    exp = _con().execute(e.oracle_sql()["dedup_spans"]).fetchdf()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False, check_exact=True)


def test_dedup_spans_planted(ray_session):
    """A verbatim 10-token span planted in three docs: the minimum
    doc_id keeps it intact, the other two lose exactly the covered
    tokens; sub-n docs and unique docs are untouched; 1-row batches
    give identical output (partition invariance)."""
    import ray as rd

    from address_address_matching_ray.pipelines.text import (
        remove_duplicate_spans,
    )

    span = " ".join(f"s{i}" for i in range(10))
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            f"alpha beta {span} gamma delta",
            f"left{0} {span} right0 right1 right2 right3 right4",
            f"{span}",
            "too short to have ngrams",
            "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9 u10",
        ]})
    out = (remove_duplicate_spans(rd.data.from_pandas(docs), n=8,
                                  buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc 1 is the keeper: nothing removed
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[0, "clean_text"] == docs.loc[0, "text"]
    # docs 2 and 3 lose the whole span (every 8-gram inside it also
    # occurs in doc 1 -- including the boundary 8-grams? no: only the
    # pure-span windows are shared, which cover all 10 span tokens)
    assert out.loc[1, "n_removed"] == 10
    assert out.loc[1, "clean_text"] == \
        "left0 right0 right1 right2 right3 right4"
    assert out.loc[2, "n_removed"] == 10
    assert out.loc[2, "clean_text"] == ""
    # short and unique docs untouched
    assert out.loc[3, "n_removed"] == 0 and out.loc[4, "n_removed"] == 0
    out2 = (remove_duplicate_spans(
        rd.data.from_pandas(docs).repartition(5), n=8, buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def test_dedup_spans_path_parity(ray_session):
    """Broadcast strip ≡ union-shuffle strip on a corpus with real
    duplication (sf0.001 documents)."""
    import __ray_entry__ as e

    from address_address_matching_ray.pipelines.text import (
        remove_duplicate_spans,
    )

    a = (remove_duplicate_spans(_read_docs(), n=8)
         .to_pandas().reset_index(drop=True))
    b = (remove_duplicate_spans(_read_docs(), n=8, force_join=True)
         .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    exp = _con().execute(e.oracle_sql()["dedup_spans"]).fetchdf()
    pd.testing.assert_frame_equal(a, exp, check_dtype=False,
                                  check_exact=True)
