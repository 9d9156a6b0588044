"""Benchmark n-gram decontamination: DuckDB oracle at sf0.001, path
equivalence (broadcast vs membership-join fallback), and planted-
contamination semantics."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"

SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    b AS (SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS ng
          FROM toks, UNNEST(generate_series(1, len(t)-8+1)) AS u(i)
          WHERE doc_id % 97 = 0 AND len(t) >= 8),
    pos AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS ng
            FROM toks, UNNEST(generate_series(1, len(t)-8+1)) AS u(i)
            WHERE doc_id % 97 <> 0 AND len(t) >= 8),
    hits AS (SELECT pos.doc_id, count(b.ng) AS n_hits
             FROM pos LEFT JOIN b USING (ng) GROUP BY pos.doc_id)
    SELECT tk.doc_id, greatest(len(tk.t) - 7, 0)::BIGINT AS n_pos,
           COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
           COALESCE(h.n_hits, 0) = 0 AS keep
    FROM toks tk LEFT JOIN hits h USING (doc_id)
    WHERE tk.doc_id % 97 <> 0 ORDER BY tk.doc_id"""


def _split(sf):
    from address_address_matching_ray.pipelines.relational import read

    docs = read(sf, "documents", columns=["doc_id", "text"])

    def part(df, bench):
        m = (df["doc_id"] % 97) == 0
        return df[m if bench else ~m].reset_index(drop=True)

    return (docs.map_batches(lambda d: part(d, False),
                             batch_format="pandas"),
            docs.map_batches(lambda d: part(d, True),
                             batch_format="pandas"))


def test_decontaminate_oracle(ray_session):
    from address_address_matching_ray.pipelines.text import decontaminate

    corpus, bench = _split(SF)
    got = decontaminate(corpus, bench).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(SQL).fetchdf().astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))
    assert (~got["keep"]).any(), "no contaminated doc at sf0.001 — " \
        "the fixture degenerated; pick a different benchmark predicate"


def test_decontaminate_fallback_path_identical(ray_session):
    """broadcast_threshold=0 forces the bucketed membership-join scale
    path; results must be identical to the broadcast path."""
    from address_address_matching_ray.pipelines.text import decontaminate

    corpus, bench = _split(SF)
    a = decontaminate(corpus, bench).to_pandas()
    corpus, bench = _split(SF)
    b = (decontaminate(corpus, bench, broadcast_threshold=0)
         .to_pandas()[a.columns])
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True),
                                  check_dtype=False)


def test_decontaminate_planted(ray_session):
    """A corpus doc embedding a benchmark 8-gram verbatim is flagged
    with the exact positional hit count; others keep=True."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.text import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # contains the first 8-gram of the benchmark, once
            "x y " + " ".join(bench_text.split()[:8]) + " z",
            "totally unrelated words none shared with anything here ok",
            "short doc",  # < 8 words → n_pos 0, keep
        ]})
    bench = pd.DataFrame({"doc_id": [100], "text": [bench_text]})
    got = (decontaminate(rd.from_pandas(corpus), rd.from_pandas(bench))
           .to_pandas().set_index("doc_id"))
    assert not got.loc[1, "keep"] and got.loc[1, "n_hits"] == 1
    assert got.loc[2, "keep"] and got.loc[2, "n_hits"] == 0
    assert got.loc[3, "keep"] and got.loc[3, "n_pos"] == 0


def test_bloom_decontaminate_one_sided_error(ray_session):
    """Bloom property gates: (a) parity with the exact path at the
    default m (FP-free regime); (b) at an adversarially small bitmap
    (m=2^10 ≪ k·n-grams) false positives MUST occur and MUST be
    one-sided — every exact hit is also a Bloom hit (no false
    negatives: contaminated docs are never kept)."""
    from address_address_matching_ray.pipelines.text import (
        bloom_decontaminate, decontaminate,
    )

    corpus, bench = _split(SF)
    exact = decontaminate(corpus, bench).to_pandas()
    bloom = bloom_decontaminate(corpus, bench).to_pandas()
    pd.testing.assert_frame_equal(exact, bloom)   # FP-free at m=2^24

    tiny = bloom_decontaminate(corpus, bench, m_log2=10).to_pandas()
    assert (tiny["n_hits"].to_numpy()
            >= exact["n_hits"].to_numpy()).all()          # one-sided
    assert (tiny["n_hits"].to_numpy()
            > exact["n_hits"].to_numpy()).any()           # FPs occur
    # no false negatives: everything the exact path flags stays flagged
    assert not (tiny["keep"].to_numpy()
                & ~exact["keep"].to_numpy()).any()
