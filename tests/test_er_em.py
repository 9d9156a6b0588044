"""Fellegi–Sunter probabilistic-linkage module: oracled posterior /
blocking-metric surfaces at sf0.001 plus EM behavioral gates (planted-
parameter recovery, log-likelihood monotonicity, determinism)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{SF}/customer.parquet')")
    return con


def _q(name):
    import __ray_entry__ as e

    out = e.queries()[name](SF)
    return out.to_pandas() if hasattr(out, "to_pandas") else out


def _oracle(name):
    import __ray_entry__ as e

    return _con().execute(e.oracle_sql()[name]).fetchdf()


def test_fs_posteriors_oracle_bit_parity(ray_session):
    got = _q("fs_posteriors").reset_index(drop=True)
    exp = _oracle("fs_posteriors")
    for c in ["custkey_l", "custkey_r", "g_name", "g_seg", "g_bal"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert (got["posterior"].to_numpy().view("int64") ==
            exp["posterior"].to_numpy().view("int64")).all(), \
        "posterior doubles must be bit-identical to the DuckDB chain"
    p = got["posterior"].to_numpy()
    assert ((p > 0) & (p < 1)).all()


def test_fs_posteriors_monotone_in_agreement(ray_session):
    """With m favoring agreement and u favoring disagreement, raising
    any single gamma level must raise the posterior."""
    got = _q("fs_posteriors")
    piv = got.groupby(["g_name", "g_seg", "g_bal"])["posterior"].first()
    for (gn, gs, gb), v in piv.items():
        for bumped in [(gn + 1, gs, gb), (gn, gs + 1, gb),
                       (gn, gs, gb + 1)]:
            if bumped in piv.index:
                assert piv[bumped] > v, (bumped, (gn, gs, gb))


def test_blocking_metrics_oracle(ray_session):
    got = _q("blocking_metrics").reset_index(drop=True)
    exp = _oracle("blocking_metrics").reset_index(drop=True)
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()),
                                  check_like=True)
    by = got.set_index("scheme")
    # composite blocking prunes strictly more pairs, captures no more
    assert (by.loc["nation_segment", "reduction_ratio"] >
            by.loc["nation", "reduction_ratio"])
    assert (by.loc["nation_segment", "pairs_completeness"] <=
            by.loc["nation", "pairs_completeness"])
    assert (by["n_captured_pairs"] <= by["n_truth_pairs"]).all()
    assert (by["n_captured_pairs"] <= by["n_candidate_pairs"]).all()


def _planted_pairs(n=60_000, seed=7):
    """Comparison vectors sampled from a known FS mixture."""
    import ray.data as rd

    rng = np.random.RandomState(seed)
    lam = 0.2
    m = {"g_name": [0.1, 0.9], "g_seg": [0.2, 0.8],
         "g_bal": [0.05, 0.15, 0.8]}
    u = {"g_name": [0.95, 0.05], "g_seg": [0.7, 0.3],
         "g_bal": [0.8, 0.15, 0.05]}
    is_match = rng.rand(n) < lam
    cols = {"custkey_l": np.arange(n, dtype="int64"),
            "custkey_r": np.arange(n, dtype="int64") + n}
    for f in m:
        lv = len(m[f])
        draw_m = rng.choice(lv, size=n, p=m[f])
        draw_u = rng.choice(lv, size=n, p=u[f])
        cols[f] = np.where(is_match, draw_m, draw_u).astype("int64")
    return (rd.from_pandas(pd.DataFrame(cols)).repartition(8),
            lam, m, u)


def test_fs_em_recovers_planted_parameters(ray_session):
    from address_address_matching_ray.pipelines.er_em import fs_em

    pairs, lam, m, u = _planted_pairs()
    params, weights, ll = fs_em(
        pairs, {"g_name": 2, "g_seg": 2, "g_bal": 3}, iters=60)
    assert abs(params["lam"] - lam) < 0.03, params["lam"]
    for f in m:
        assert np.abs(params["m"][f] - np.array(m[f])).max() < 0.06, f
        assert np.abs(params["u"][f] - np.array(u[f])).max() < 0.06, f
    # log-likelihood must be monotone non-decreasing (EM guarantee)
    ll = np.asarray(ll)
    assert (np.diff(ll) >= -1e-6 * np.abs(ll[:-1])).all()
    # agreement levels carry positive match weight once fit
    w = weights.set_index(["field", "level"])
    assert w.loc[("g_bal", 2), "match_weight"] > 0
    assert w.loc[("g_bal", 0), "match_weight"] < 0


def test_fs_em_deterministic(ray_session):
    from address_address_matching_ray.pipelines.er_em import fs_em_weights

    a = fs_em_weights(SF, iters=10)
    b = fs_em_weights(SF, iters=10)
    pd.testing.assert_frame_equal(a, b)


def test_fs_em_empty_raises(ray_session):
    import ray.data as rd

    from address_address_matching_ray.pipelines.er_em import fs_em

    empty = rd.from_pandas(pd.DataFrame(
        {"g_name": pd.Series([], dtype="int64"),
         "g_seg": pd.Series([], dtype="int64"),
         "g_bal": pd.Series([], dtype="int64")}))
    with pytest.raises(ValueError):
        fs_em(empty, {"g_name": 2, "g_seg": 2, "g_bal": 3}, iters=2)


def test_tf_posteriors_oracle_and_rarity(ray_session):
    got = _q("tf_posteriors").reset_index(drop=True)
    exp = _oracle("tf_posteriors")
    assert (got["posterior"].to_numpy().view("int64") ==
            exp["posterior"].to_numpy().view("int64")).all()
    # TF adjustment: among pairs with identical gammas that agree on
    # segment, a rarer shared value must give a HIGHER posterior
    agree = got[got["g_seg"] == 1]
    counts = _con().execute(
        "SELECT c_mktsegment AS seg, count(*) AS n FROM customer "
        "GROUP BY 1").fetchdf().set_index("seg")["n"]
    sub = agree[(agree["g_name"] == 0) & (agree["g_bal"] == 0)]
    by_seg = sub.groupby("seg")["posterior"].first().dropna()
    if len(by_seg) >= 2:
        ordered = counts.loc[by_seg.index].sort_values()
        posts = by_seg.loc[ordered.index].to_numpy()
        assert (np.diff(posts) <= 0).all(), \
            "posterior must not increase with value frequency"


def test_golden_records_oracle_and_rules(ray_session):
    got = _q("golden_records").reset_index(drop=True)
    exp = _oracle("golden_records")
    a = got[sorted(got.columns)]
    b = exp[sorted(exp.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                  check_like=True)
    # survivorship rules hold against a driver-side brute force
    cust = _con().execute("SELECT * FROM customer").fetchdf()
    cust["cluster"] = cust["c_custkey"] % 50
    for r in got.head(5).itertuples():
        grp = cust[cust["cluster"] == r.cluster]
        assert r.n_members == len(grp)
        assert r.max_bal == grp["c_acctbal"].max()
        assert r.min_custkey == grp["c_custkey"].min()
        vc = grp["c_mktsegment"].value_counts()
        best = sorted(vc[vc == vc.max()].index)[0]
        assert r.segment == best


def test_sorted_neighborhood_oracle(ray_session):
    got = _q("sorted_neighborhood").reset_index(drop=True)
    exp = _oracle("sorted_neighborhood")
    a = got[sorted(got.columns)]
    b = exp[sorted(exp.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                  check_like=True)
    assert got["rank_dist"].between(1, 5).all()


def test_sorted_neighborhood_carry_spans_small_buckets(ray_session):
    """With 64 buckets over 150 rows (~2 rows/bucket < window=5) the
    carry must reach back across several buckets — same pairs as the
    single-partition oracle."""
    import __ray_entry__ as e

    from address_address_matching_ray.pipelines.er_em import (
        sorted_neighborhood_pairs,
    )

    got = (sorted_neighborhood_pairs(SF, window=5, buckets=64)
           .to_pandas().reset_index(drop=True))
    exp = _oracle("sorted_neighborhood")
    a = got[sorted(got.columns)]
    b = exp[sorted(exp.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                  check_like=True)


def test_name_jaro_oracle_bit_parity(ray_session):
    got = _q("name_jaro").reset_index(drop=True)
    exp = _oracle("name_jaro")
    assert (got["jaro"].to_numpy().view("int64") ==
            exp["jaro"].to_numpy().view("int64")).all()


def test_jaro_matches_duckdb_on_adversarial_strings():
    """Function-level parity: our jaro_winkler(prefix_weight=0) ==
    DuckDB jaro_similarity × 100, bitwise, on transpositions,
    containments, empties and random strings."""
    import random

    from address_address_matching_ray.functions.fuzzy import jaro_winkler

    con = duckdb.connect()
    corpus = ["", "a", "ab", "ba", "martha", "marhta", "dwayne",
              "duane", "dixon", "dicksonx", "jellyfish", "smellyfish",
              "aabbccdd", "abcdefgh"]
    rng = random.Random(3)
    corpus += ["".join(rng.choice("abcde") for _ in range(rng.randint(1, 12)))
               for _ in range(60)]
    pairs = [(rng.choice(corpus), rng.choice(corpus)) for _ in range(1500)]
    for a, b in pairs:
        d = np.float64(con.execute(
            "SELECT jaro_similarity(?, ?)", [a, b]).fetchone()[0])
        p = np.float64(jaro_winkler(a, b, prefix_weight=0.0))
        assert p.view("int64") == (d * np.float64(100.0)).view("int64"), \
            (a, b, float(p), float(d * 100))


def test_name_levenshtein_oracle(ray_session):
    got = _q("name_levenshtein").reset_index(drop=True)
    exp = _oracle("name_levenshtein")
    assert (got["dist"].to_numpy() == exp["dist"].to_numpy()).all()
    assert (got["custkey_l"].to_numpy() ==
            exp["custkey_l"].to_numpy()).all()


def test_levenshtein_matches_duckdb_incl_long_strings():
    """Myers bit-parallel (≤64) and the vectorized DP fallback (>64)
    both match DuckDB levenshtein exactly."""
    import random

    from address_address_matching_ray.functions.fuzzy import levenshtein

    con = duckdb.connect()
    rng = random.Random(5)
    corpus = ["", "a", "kitten", "sitting", "intention", "execution",
              "x" * 70, "x" * 69 + "y", "ab" * 40, "ba" * 40]
    corpus += ["".join(rng.choice("abcd")
                       for _ in range(rng.randint(0, 90)))
               for _ in range(80)]
    for _ in range(1200):
        a, b = rng.choice(corpus), rng.choice(corpus)
        assert levenshtein(a, b) == con.execute(
            "SELECT levenshtein(?, ?)", [a, b]).fetchone()[0], (a, b)
        assert levenshtein(a, b) == levenshtein(b, a)


def test_name_damerau_oracle_and_full_variant():
    """Function parity incl. the full-vs-OSA distinguishing case."""
    import random

    from address_address_matching_ray.functions.fuzzy import (
        damerau_levenshtein,
    )

    assert damerau_levenshtein("ca", "abc") == 2  # full DL, OSA = 3
    assert damerau_levenshtein("ab", "ba") == 1
    con = duckdb.connect()
    rng = random.Random(7)
    corpus = ["", "a", "ca", "abc", "ab", "ba", "abcdef", "badcfe"]
    corpus += ["".join(rng.choice("abcd")
                       for _ in range(rng.randint(0, 25)))
               for _ in range(80)]
    for _ in range(800):
        a, b = rng.choice(corpus), rng.choice(corpus)
        assert damerau_levenshtein(a, b) == con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]).fetchone()[0]


def test_name_damerau_query_oracle(ray_session):
    got = _q("name_damerau").reset_index(drop=True)
    exp = _oracle("name_damerau")
    assert (got["dl_dist"].to_numpy() == exp["dl_dist"].to_numpy()).all()
    lev = _q("name_levenshtein").reset_index(drop=True)
    # DL is never larger than plain Levenshtein
    assert (got["dl_dist"].to_numpy() <= lev["dist"].to_numpy()).all()


def test_clerical_review_oracle(ray_session):
    got = _q("clerical_review").reset_index(drop=True)
    exp = _oracle("clerical_review")
    a = got[sorted(got.columns)]
    b = exp[sorted(exp.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                  check_like=True)
    assert len(got) > 0
    p = got["posterior"].to_numpy()
    assert ((p >= 0.01) & (p < 0.95)).all()


def test_match_threshold_sweep_oracle(ray_session):
    """Bit-exact vs the DuckDB replay (integer micro-unit mass sums,
    pinned ratio op order), plus the analytic invariants: n_above and
    exp_recall are non-increasing in the threshold, and precision is
    the above-mass average so it sits in [0, 1]."""
    got = _q("match_threshold_sweep").reset_index(drop=True)
    exp = _oracle("match_threshold_sweep")
    a = got.sort_values("threshold").reset_index(drop=True)
    b = (exp[sorted(exp.columns)].sort_values("threshold")
         .reset_index(drop=True))
    for c in a.columns:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    n = a["n_above"].to_numpy()
    assert (np.diff(n) <= 0).all()
    assert (np.diff(a["exp_recall"].to_numpy()) <= 0).all()
    pr = a["exp_precision"].to_numpy()
    assert ((pr >= 0.0) & (pr <= 1.0)).all()
    # the sf0.001 grid exercises the empty-tail zero-guard
    assert n[-1] == 0 and a["exp_f1"].to_numpy()[-1] == 0.0


def test_one_to_one_matches_oracle_and_1to1(ray_session):
    got = _q("one_to_one_matches").reset_index(drop=True)
    exp = _oracle("one_to_one_matches")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)
    # the 1:1 guarantee: no entity appears in more than one kept pair
    ids = np.concatenate([got["custkey_l"].to_numpy(),
                          got["custkey_r"].to_numpy()])
    assert len(np.unique(ids)) == len(ids)
    # every kept pair clears the posterior floor
    assert (got["posterior"].to_numpy() >= 0.2).all()
    # MNN is a SUBSET of the scored pairs above the floor
    pairs = _q("fs_posteriors")
    above = pairs[pairs["posterior"] >= 0.2]
    key = set(zip(above["custkey_l"], above["custkey_r"]))
    assert all((l, r) in key
               for l, r in zip(got["custkey_l"], got["custkey_r"]))


def test_cluster_eval_oracle_and_bruteforce(ray_session):
    """Bit-exact vs the DuckDB contingency-cell replay, and the
    pairwise metrics re-derived by brute-force pair enumeration on a
    small planted labels table (the generic core, independent of the
    customer-table wrapper)."""
    import itertools

    import ray

    from address_address_matching_ray.pipelines.er_em import (
        cluster_pair_metrics,
    )

    got = _q("cluster_eval").reset_index(drop=True)
    exp = _oracle("cluster_eval")
    assert list(got["metric"]) == list(exp["metric"])
    assert (got["value"].to_numpy().view("int64") ==
            exp["value"].to_numpy().view("int64")).all(), \
        "metric doubles must be bit-identical to the DuckDB chain"

    rng = np.random.default_rng(7)
    lab = pd.DataFrame({"pred": rng.integers(0, 9, 400),
                        "truth": rng.integers(0, 7, 400)})
    m = cluster_pair_metrics(ray.data.from_pandas(lab), buckets=8)
    vals = dict(zip(m["metric"], m["value"]))
    tp = pp = tr = 0
    for i, j in itertools.combinations(range(len(lab)), 2):
        sp = lab["pred"][i] == lab["pred"][j]
        st = lab["truth"][i] == lab["truth"][j]
        pp += sp
        tr += st
        tp += sp and st
    assert vals["tp_pairs"] == tp
    assert vals["pred_pairs"] == pp
    assert vals["truth_pairs"] == tr
    assert vals["pairwise_precision"] == tp / pp
    assert vals["pairwise_recall"] == tp / tr
    # B3 by per-record definition (within micro-unit quantization)
    cell = lab.groupby(["pred", "truth"]).size()
    npred = lab.groupby("pred").size()
    ntru = lab.groupby("truth").size()
    b3p = sum(c * (c / npred[p]) for (p, t), c in cell.items()) / len(lab)
    b3r = sum(c * (c / ntru[t]) for (p, t), c in cell.items()) / len(lab)
    assert abs(vals["b3_precision"] - b3p) < 1e-4
    assert abs(vals["b3_recall"] - b3r) < 1e-4
    # partition-invariance: 1-row batches give identical integers
    m2 = cluster_pair_metrics(
        ray.data.from_pandas(lab).repartition(40), buckets=8)
    assert (m2["value"].to_numpy() == m["value"].to_numpy()).all()


def test_meta_blocking_oracle_and_invariants(ray_session):
    got = _q("meta_blocking").reset_index(drop=True)
    exp = _oracle("meta_blocking")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)
    w = got["w"].to_numpy()
    assert ((w >= 1) & (w <= 3)).all()   # CBS weight = #schemes max
    # WEP: every kept edge is strictly above the global mean weight,
    # recomputed here over the unpruned edge set via the oracle CTEs
    con = _con()
    tot = con.execute("""
        WITH c AS (SELECT c_custkey AS k, c_nationkey AS nk,
                     CASE c_mktsegment
                       WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
                       WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3
                       WHEN 'MACHINERY' THEN 4 ELSE 7 END AS sg
                   FROM customer),
        b AS (SELECT nk AS block_id, k FROM c
              UNION ALL SELECT 4294967296 + sg, k FROM c
              UNION ALL SELECT 2*4294967296 + nk*8 + sg, k FROM c),
        e AS (SELECT a.k AS l, b2.k AS r
              FROM b a JOIN b b2 USING (block_id) WHERE a.k < b2.k),
        w AS (SELECT l, r, count(*) AS w FROM e GROUP BY l, r)
        SELECT count(*) AS ne, sum(w) AS sw FROM w""").fetchone()
    ne, sw = int(tot[0]), int(tot[1])
    assert (w * ne > sw).all()
    # a mutually-exclusive scheme triple can never exceed weight 3 and
    # every kept pair shares nation AND segment at this data shape
    nat = con.execute(
        "SELECT c_custkey, c_nationkey, c_mktsegment FROM customer"
    ).fetchdf().set_index("c_custkey")
    for l, r in zip(got["custkey_l"][:50], got["custkey_r"][:50]):
        assert nat.loc[l, "c_nationkey"] == nat.loc[r, "c_nationkey"]


def test_monge_elkan_oracle_and_function(ray_session):
    """Bit-exact vs the DuckDB list-lambda replay, plus analytic
    checks of the ME definition: identical names score 100, ME is
    bounded by the best single-token Jaro, and symmetry holds exactly
    when token multisets coincide."""
    import __ray_entry__ as e

    got = _q("monge_elkan").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{SF}/part.parquet')")
    exp = con.execute(e.oracle_sql()["monge_elkan"]).fetchdf()
    for c in ["partkey_l", "partkey_r"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    for c in ["me_lr", "me_rl"]:
        assert (got[c].to_numpy().view("int64") ==
                exp[c].to_numpy().view("int64")).all(), c
    v = got[["me_lr", "me_rl"]].to_numpy()
    assert (v >= 0).all() and (v <= 100.0).all()
    # planted sanity on the kernel contract (the closure's exact
    # formula, replayed): identical strings score 100, and ME is
    # asymmetric when token counts differ
    import math

    from address_address_matching_ray.functions.fuzzy import jaro_winkler

    def me_one(a: str, b: str) -> float:
        ta, tb = a.split(" "), b.split(" ")
        s = 0
        for x in ta:
            best = max(jaro_winkler(x, y, prefix_weight=0.0) for y in tb)
            s += int(math.floor(best * 1e10))
        return (s / 1e10) / len(ta)

    assert me_one("cold widget", "cold widget") == 100.0
    assert me_one("cold", "cold widget economy") == 100.0   # subset l→r
    assert me_one("cold widget economy", "cold") < 100.0    # but not r→l


def test_name_qgram_dice_oracle_and_properties(ray_session):
    got = _q("name_qgram").reset_index(drop=True)
    exp = _oracle("name_qgram")
    for c in ["custkey_l", "custkey_r"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    assert (got["dice"].to_numpy().view("int64") ==
            exp["dice"].to_numpy().view("int64")).all()
    d = got["dice"].to_numpy()
    assert ((d >= 0.0) & (d <= 1.0)).all()
    # identical customer-name prefixes dominate: every blocked pair
    # shares 'Customer#0000...' so dice is high but < 1 for distinct
    assert d.min() > 0.5 and (d < 1.0).all()


def test_meta_blocking_purge_path(ray_session):
    """max_block_size small enough to purge the nation and segment
    blocks at sf0.001 — only pairs evidenced by surviving blocks
    remain, verified against a parameterized DuckDB replay."""
    from address_address_matching_ray.pipelines.er_em import (
        meta_blocking_pairs,
    )

    cap = 10
    got = (meta_blocking_pairs(SF, max_block_size=cap)
           .to_pandas().reset_index(drop=True))
    exp = _con().execute(f"""
        WITH c AS (SELECT c_custkey AS k, c_nationkey AS nk,
                     CASE c_mktsegment
                       WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
                       WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3
                       WHEN 'MACHINERY' THEN 4 ELSE 7 END AS sg
                   FROM customer),
        b AS (SELECT nk AS block_id, k FROM c
              UNION ALL SELECT 4294967296 + sg, k FROM c
              UNION ALL SELECT 2*4294967296 + nk*8 + sg, k FROM c),
        sz AS (SELECT block_id, count(*) AS n FROM b GROUP BY block_id),
        bp AS (SELECT b.block_id, b.k FROM b JOIN sz USING (block_id)
               WHERE sz.n <= {cap}),
        e AS (SELECT a.k AS l, b2.k AS r
              FROM bp a JOIN bp b2 USING (block_id) WHERE a.k < b2.k),
        w AS (SELECT l, r, count(*)::BIGINT AS w FROM e GROUP BY l, r),
        tot AS (SELECT count(*)::BIGINT AS ne, sum(w)::BIGINT AS sw
                FROM w)
        SELECT l AS custkey_l, r AS custkey_r, w
        FROM w, tot WHERE w * ne > sw
        ORDER BY custkey_l, custkey_r""").fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)
    # purging reduced the evidence base vs the default cap
    full = _q("meta_blocking")
    assert len(got) < len(full) or len(full) == 0


def test_posterior_calibration_oracle_and_mass(ray_session):
    got = _q("posterior_calibration").reset_index(drop=True)
    exp = _oracle("posterior_calibration")
    for c in ["bin", "n_pairs", "n_match"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    for c in ["avg_pred", "frac_match"]:
        assert (got[c].to_numpy().view("int64") ==
                exp[c].to_numpy().view("int64")).all(), c
    # mass conservation: bin pair counts sum to the scored-pair count
    assert got["n_pairs"].sum() == len(_q("fs_posteriors"))
    # avg_pred lies inside its bin's interval (quantization ≤ 1e-6)
    lo = got["bin"].to_numpy() / 20.0 - 1e-6
    hi = (got["bin"].to_numpy() + 1) / 20.0 + 1e-6
    ap = got["avg_pred"].to_numpy()
    assert ((ap >= lo) & (ap <= hi)).all()


def test_cluster_eval_ari_bruteforce(ray_session):
    """ARI against sklearn-free brute force on a planted labels table:
    identical clusterings give ARI 1.0; independent ones near 0."""
    import ray

    from address_address_matching_ray.pipelines.er_em import (
        cluster_pair_metrics,
    )

    rng = np.random.default_rng(11)
    same = rng.integers(0, 6, 300)
    m = cluster_pair_metrics(
        ray.data.from_pandas(pd.DataFrame({"pred": same, "truth": same})),
        buckets=4)
    vals = dict(zip(m["metric"], m["value"]))
    assert vals["ari"] == 1.0
    # brute-force Hubert-Arabie on a random pair of labelings
    lab = pd.DataFrame({"pred": rng.integers(0, 9, 400),
                        "truth": rng.integers(0, 7, 400)})
    m2 = cluster_pair_metrics(ray.data.from_pandas(lab), buckets=8)
    v2 = dict(zip(m2["metric"], m2["value"]))
    cells = lab.groupby(["pred", "truth"]).size()
    tp = sum(c * (c - 1) // 2 for c in cells)
    pp = sum(c * (c - 1) // 2 for c in lab.groupby("pred").size())
    tr = sum(c * (c - 1) // 2 for c in lab.groupby("truth").size())
    tot = 400 * 399 // 2
    e = float(pp) * float(tr) / float(tot)
    ari = (float(tp) - e) / (0.5 * (float(pp) + float(tr)) - e)
    assert v2["ari"] == ari
    assert abs(v2["ari"]) < 0.2   # independent labelings: near zero
