"""Probabilistic record linkage: Fellegi–Sunter comparison vectors,
distributed EM parameter estimation, and match posteriors.

Public constructions only: Fellegi & Sunter (JASA 1969), Winkler's EM
fitting of the match/non-match mixture (1988), and the discrete
comparison-level (gamma) model popularized by Splink.  The reference
repo ships FIXED hand-tuned weights (reference main.py:24-33 /
utils.py:281-364, re-expressed as ``config.TIER_TABLE``); this module
is the learning counterpart — it estimates the m/u probabilities and
the match prevalence λ from *unlabeled* candidate pairs, which is what
an entity-resolution team actually runs before committing weights.

Distributed shape (the 100-TB contract):

* ``pair_comparisons`` — ONE hash shuffle of block keys into
  buckets (``_block_buckets``); each bucket expands ALL its blocks in
  one vectorized pandas ``merge(on=key)`` — never one Ray group per
  block (4× measured at 500k blocks, BASELINE.md) — and emits slim
  all-int64 gamma rows (40 B/pair).  Block sizes must be bounded by
  the blocking-key choice, exactly like ``stages/pairs.py`` (which
  additionally caps pathological blocks).
* ``fs_em`` — the k-means/gradient-all-reduce shape
  (``similarity.embedding_kmeans``): per iteration the current
  parameters are broadcast once (``ray.put``) and one ``map_batches``
  pass emits ≤ Σ_k levels_k + 2 partial rows per batch — per-(field,
  level) expected-match mass — which the driver folds into the next
  parameter set.  The pair table streams; only O(Σ levels) floats ever
  sit on the driver.
* ``fs_posteriors`` — stateless one-pass scoring map, shuffle-free.

Determinism: partial rows are lexsorted before the driver reduce so
float summation order is independent of block arrival order (the
``embedding_kmeans`` recipe); EM runs a fixed iteration budget with a
deterministic early-stop test.

Oracle status: ``fs_posteriors`` is DuckDB-oracled bit-for-bit (the
E-step arithmetic at fixed literal parameters is per-row double math
with a controlled operation order — no aggregation-order drift);
``fs_em`` is iterative and carries pytest planted-parameter recovery +
log-likelihood-monotonicity + determinism gates instead.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

# Comparison fields over the customer table and their level counts.
CUSTOMER_FIELDS: dict[str, int] = {"g_name": 2, "g_seg": 2, "g_bal": 3}

# Fixed literal parameters for the oracled posterior surface.  These
# are deliberately module-level literals so the DuckDB oracle embeds
# the exact same decimal tokens (both parsers produce the identical
# nearest double).
FIXED_LAMBDA = 0.05
FIXED_M = {"g_name": (0.15, 0.85),
           "g_seg": (0.25, 0.75),
           "g_bal": (0.1, 0.3, 0.6)}
FIXED_U = {"g_name": (0.99, 0.01),
           "g_seg": (0.8, 0.2),
           "g_bal": (0.7, 0.25, 0.05)}


def _customer_features(sf_dir: str):
    """Pruned customer read + per-row comparison features (computed
    once per row, BEFORE pair expansion multiplies the row count)."""
    from .relational import read

    ds = read(sf_dir, "customer",
              columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                       "c_mktsegment"])

    def feats(t: pa.Table) -> pd.DataFrame:
        name = t["c_name"].to_pandas()
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        # integer cents via floor(v*100 + 0.5): immune to the
        # round-half-even (numpy) vs half-away (DuckDB) split because
        # acctbal carries exactly 2 decimals (v*100 is integer ± ulp).
        cents = np.floor(bal * 100.0 + 0.5).astype("int64")
        return pd.DataFrame({
            "c_custkey": t["c_custkey"].to_numpy(zero_copy_only=False),
            "c_nationkey": t["c_nationkey"].to_numpy(zero_copy_only=False),
            "name3": name.str[-3:],
            "cents": cents,
            "seg": t["c_mktsegment"].to_pandas()})

    return ds.map_batches(feats, batch_format="pyarrow")


def _block_buckets(ds, buckets: int = 64):
    """Hash the blocking key into ``buckets`` groups so pair expansion
    is one vectorized in-bucket ``merge(on=key)`` over MANY blocks per
    task — never one Ray group per block (500k-block corpora measured
    0.19M pairs/s with per-block groups; bucketed expansion removes
    the per-group dispatch entirely)."""

    def add_b(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = nk.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    return ds.map_batches(add_b, batch_format="pyarrow").groupby("_b")


def pair_comparisons(sf_dir: str):
    """Blocked candidate pairs over ``customer`` with discrete
    Fellegi–Sunter comparison levels (gamma vector):

    * ``g_name`` ∈ {0,1} — last-3-char name suffix agreement,
    * ``g_seg``  ∈ {0,1} — market-segment agreement,
    * ``g_bal``  ∈ {0,1,2} — account-balance proximity
      (|Δ| < $100 → 2, < $1000 → 1, else 0; integer-cent arithmetic),

    blocking on ``c_nationkey`` (one bucketed hash shuffle via
    ``_block_buckets``; a bucket's pairs are generated by one local
    vectorized merge over all its blocks, never a distributed cross
    join and never per-block Ray groups).  Emits slim all-int64 rows —
    the pair table that ``fs_em``/``fs_posteriors`` consume."""
    feats = _customer_features(sf_dir)

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="c_nationkey", suffixes=("_l", "_r"))
        m = m[m["c_custkey_l"] < m["c_custkey_r"]]
        d = np.abs(m["cents_l"].to_numpy() - m["cents_r"].to_numpy())
        g_bal = np.where(d < 10_000, 2, np.where(d < 100_000, 1, 0))
        return pd.DataFrame({
            "custkey_l": m["c_custkey_l"].to_numpy(),
            "custkey_r": m["c_custkey_r"].to_numpy(),
            "g_name": (m["name3_l"].to_numpy() ==
                       m["name3_r"].to_numpy()).astype("int64"),
            "g_seg": (m["seg_l"].to_numpy() ==
                      m["seg_r"].to_numpy()).astype("int64"),
            "g_bal": g_bal.astype("int64")})

    return _block_buckets(feats).map_groups(
        lambda g: expand(g.drop(columns=["_b"])), batch_format="pandas")


def _as_param_arrays(m, u, fields):
    return ({f: np.asarray(m[f], dtype="float64") for f in fields},
            {f: np.asarray(u[f], dtype="float64") for f in fields})


def fs_posteriors(sf_dir: str, lam: float = FIXED_LAMBDA,
                  m=FIXED_M, u=FIXED_U):
    """Fixed-parameter Fellegi–Sunter match posterior per candidate
    pair: ``P(match | γ) = λ·Πm / (λ·Πm + (1−λ)·Πu)``.

    The multiply order is pinned left-to-right in field order
    (name, seg, bal) and the denominator reuses the numerator term, so
    the doubles are bit-identical to the DuckDB oracle's
    ``lam * CASE.. * CASE.. * CASE..`` chain — per-row arithmetic has
    no summation-order hazard.  Stateless shuffle-free scoring map
    over ``pair_comparisons``."""
    return _scored_pairs(sf_dir, lam, m, u).sort(
        ["custkey_l", "custkey_r"])


def _scored_pairs(sf_dir: str, lam: float = FIXED_LAMBDA,
                  m=FIXED_M, u=FIXED_U):
    """Unsorted posterior-scored pair stream (the ``fs_posteriors``
    kernel without its presentation sort) — shared by calibration and
    other consumers that bin/aggregate rather than list pairs."""
    fields = list(CUSTOMER_FIELDS)
    ma, ua = _as_param_arrays(m, u, fields)

    def score(t: pa.Table) -> pd.DataFrame:
        num = np.full(t.num_rows, lam, dtype="float64")
        den_u = np.full(t.num_rows, 1.0 - lam, dtype="float64")
        out = {}
        for f in fields:
            gv = t[f].to_numpy(zero_copy_only=False)
            out[f] = gv
            num = num * ma[f][gv]
            den_u = den_u * ua[f][gv]
        return pd.DataFrame({
            "custkey_l": t["custkey_l"].to_numpy(zero_copy_only=False),
            "custkey_r": t["custkey_r"].to_numpy(zero_copy_only=False),
            **out,
            "posterior": num / (num + den_u)})

    return (pair_comparisons(sf_dir)
            .map_batches(score, batch_format="pyarrow"))


def fs_em(pairs_ds, fields: dict[str, int] | None = None,
          iters: int = 25, lam0: float = 0.1, tol: float = 1e-9,
          materialize: bool = True):
    """Unsupervised EM fit of the Fellegi–Sunter two-class mixture
    over a comparison-vector Dataset (Winkler 1988; the Splink
    ``estimate_parameters_using_expectation_maximisation`` analogue).

    Per iteration: parameters broadcast once (``ray.put``); ONE
    ``map_batches`` pass computes the per-pair match posterior w and
    emits per-(field, level) partials ``(Σw, n)`` plus a global
    ``(Σw, N)`` row and the log-likelihood — ≤ Σlevels + 2 slim rows
    per batch regardless of batch size.  Driver M-step:
    ``λ = Σw/N``, ``m_f[l] = Σw[γ_f=l]/Σw``,
    ``u_f[l] = Σ(1−w)[γ_f=l]/Σ(1−w)`` (clamped to [1e-6, 1−1e-6] and
    renormalized).  u is initialised from the observed global level
    frequencies (≈ the random-pair distribution when matches are
    rare), m from a fixed agreement-skewed simplex — both
    deterministic.

    Returns ``(params, weights_df, loglik_trace)`` where ``params`` is
    ``{"lam", "m", "u"}`` and ``weights_df`` has one row per (field,
    level) with m, u and the match weight ``log2(m/u)``.
    """
    import ray

    fields = dict(fields or CUSTOMER_FIELDS)
    names = list(fields)
    if materialize:
        # gamma rows are slim all-int64 (40 B/pair); iterating EM over
        # a materialized pair table avoids re-running the pair-gen
        # shuffle every iteration, and the object store spills if the
        # pair table outgrows memory.
        pairs_ds = pairs_ds.materialize()

    def _reduce(part: pd.DataFrame) -> pd.DataFrame:
        # deterministic fold order regardless of block arrival
        order = np.lexsort((part["n"].to_numpy(), part["sw"].to_numpy(),
                            part["level"].to_numpy(),
                            part["field"].to_numpy()))
        return (part.iloc[order]
                .groupby(["field", "level"], sort=True)[["sw", "n"]]
                .sum().reset_index())

    # ── u/λ init: one counting pass (exact integer level frequencies)
    def count_levels(t: pa.Table) -> pd.DataFrame:
        rows = []
        for f in names:
            n = np.bincount(t[f].to_numpy(zero_copy_only=False),
                            minlength=fields[f])
            rows += [(f, lv, 0.0, int(n[lv])) for lv in range(fields[f])]
        return pd.DataFrame(rows, columns=["field", "level", "sw", "n"])

    part = pairs_ds.map_batches(count_levels,
                                batch_format="pyarrow").to_pandas()
    # an empty Dataset yields a column-less frame (the resumable_write
    # empty-input case from ADVICE r4) — treat it as the empty corpus
    if len(part) == 0 or "field" not in part.columns:
        raise ValueError("fs_em: empty pair dataset")
    freq = _reduce(part)
    n_total = int(freq[freq["field"] == names[0]]["n"].sum())
    if n_total == 0:
        raise ValueError("fs_em: empty pair dataset")

    lam = float(lam0)
    m: dict[str, np.ndarray] = {}
    u: dict[str, np.ndarray] = {}
    for f, levels in fields.items():
        w0 = (np.arange(levels, dtype="float64") + 1.0) ** 2
        m[f] = w0 / w0.sum()
        cnt = (freq[freq["field"] == f].sort_values("level")["n"]
               .to_numpy().astype("float64"))
        cnt = np.clip(cnt, 1.0, None)
        u[f] = cnt / cnt.sum()

    loglik_trace: list[float] = []
    for _ in range(iters):
        ref = ray.put({"lam": lam, "m": m, "u": u})

        def estep(t: pa.Table, _ref=ref) -> pd.DataFrame:
            p = ray.get(_ref)
            num = np.full(t.num_rows, p["lam"], dtype="float64")
            den_u = np.full(t.num_rows, 1.0 - p["lam"], dtype="float64")
            gvs = {}
            for f in names:
                gv = t[f].to_numpy(zero_copy_only=False)
                gvs[f] = gv
                num = num * p["m"][f][gv]
                den_u = den_u * p["u"][f][gv]
            tot = num + den_u
            w = num / tot
            rows = []
            for f in names:
                sw = np.bincount(gvs[f], weights=w, minlength=fields[f])
                n = np.bincount(gvs[f], minlength=fields[f])
                rows += [(f, lv, float(sw[lv]), int(n[lv]))
                         for lv in range(fields[f])]
            rows.append(("__all__", 0, float(w.sum()), t.num_rows))
            rows.append(("__ll__", 0, float(np.log(tot).sum()), t.num_rows))
            return pd.DataFrame(rows,
                                columns=["field", "level", "sw", "n"])

        agg = _reduce(pairs_ds.map_batches(
            estep, batch_format="pyarrow").to_pandas())
        by = {(r.field, r.level): (r.sw, r.n) for r in agg.itertuples()}
        sw_all, n_all = by[("__all__", 0)]
        loglik_trace.append(by[("__ll__", 0)][0])

        new_lam = min(max(sw_all / n_all, 1e-6), 1.0 - 1e-6)
        delta = abs(new_lam - lam)
        new_m, new_u = {}, {}
        for f, levels in fields.items():
            sm = np.array([by[(f, lv)][0] for lv in range(levels)])
            nn = np.array([float(by[(f, lv)][1]) for lv in range(levels)])
            mm = np.clip(sm / max(sw_all, 1e-300), 1e-6, 1.0 - 1e-6)
            uu = np.clip((nn - sm) / max(n_all - sw_all, 1e-300),
                         1e-6, 1.0 - 1e-6)
            new_m[f] = mm / mm.sum()
            new_u[f] = uu / uu.sum()
            delta = max(delta,
                        float(np.abs(new_m[f] - m[f]).max()),
                        float(np.abs(new_u[f] - u[f]).max()))
        lam, m, u = new_lam, new_m, new_u
        if delta < tol:
            break

    rows = []
    for f, levels in fields.items():
        for lv in range(levels):
            rows.append((f, lv, float(m[f][lv]), float(u[f][lv]),
                         math.log2(m[f][lv] / u[f][lv]), lam))
    weights = pd.DataFrame(rows, columns=["field", "level", "m", "u",
                                          "match_weight", "lam"])
    return {"lam": lam, "m": m, "u": u}, weights, loglik_trace


def fs_em_weights(sf_dir: str, iters: int = 10) -> pd.DataFrame:
    """Query surface: EM-learned Fellegi–Sunter parameters over the
    customer candidate pairs.

    DuckDB-oracled: the oracle unrolls the same ``iters`` EM rounds as
    CTE layers (``__ray_entry__._fs_em_sql``).  ``tol=0`` pins the
    full iteration budget so both sides run identical round counts,
    and the published parameters are floor-quantized to 1e-6 — the
    per-(field,level) Σw folds differ between the blockwise lexsorted
    reduce here and SQL's aggregate order by last-ulp amounts, which
    the quantization absorbs.
    pytest additionally carries planted-parameter recovery,
    likelihood-monotonicity and determinism gates."""
    _, weights, _ = fs_em(pair_comparisons(sf_dir), CUSTOMER_FIELDS,
                          iters=iters, tol=0.0)
    weights = weights.sort_values(["field", "level"]).reset_index(drop=True)
    for c in ("m", "u", "match_weight", "lam"):
        weights[c] = np.floor(weights[c].to_numpy() * 1e6) / 1e6
    return weights


# ──────────────────────────────────────────────────────────────
# blocking-scheme evaluation
# ──────────────────────────────────────────────────────────────

BLOCKING_SCHEMES: dict[str, list[str]] = {
    "nation": ["c_nationkey"],
    "segment": ["c_mktsegment"],
    "nation_segment": ["c_nationkey", "c_mktsegment"],
}
TRUTH_MOD = 50  # planted-duplicate truth key: c_custkey % TRUTH_MOD


def blocking_metrics(sf_dir: str,
                     schemes: dict[str, list[str]] | None = None,
                     truth_mod: int = TRUTH_MOD) -> pd.DataFrame:
    """Standard blocking-quality evaluation (reduction ratio and pairs
    completeness, e.g. Christen's *Data Matching* §7.5) for a set of
    candidate blocking schemes, against a deterministic planted-
    duplicate truth key (``c_custkey % truth_mod`` — stands in for a
    labeled duplicate set).

    * reduction ratio   = 1 − Σ_blocks C(g,2) / C(n,2)
    * pairs completeness = captured truth pairs / truth pairs, where a
      truth pair is captured iff both rows share a block.

    Everything is group COUNTS: one ``map_batches`` combiner emits
    bounded ``(kind, key, n)`` partials (≤ |schemes|·blocks + truth
    groups + truth×block groups rows per batch), a tiny groupby makes
    them global, and the pair arithmetic (ΣC(g,2), exact integers;
    ONE final double division per metric) runs on the collapsed table.
    The only driver pull is that bounded summary — no pair is ever
    materialized."""
    from .relational import read

    schemes = dict(schemes or BLOCKING_SCHEMES)
    ds = read(sf_dir, "customer",
              columns=["c_custkey", "c_nationkey", "c_mktsegment"])

    def partials(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["_t"] = df["c_custkey"] % truth_mod
        out = []
        for name, cols in schemes.items():
            key = df[cols[0]].astype(str)
            for c in cols[1:]:
                key = key + "\x1f" + df[c].astype(str)
            vc = key.value_counts()
            out.append(pd.DataFrame({"kind": "b:" + name,
                                     "key": vc.index.astype(str),
                                     "n": vc.to_numpy()}))
            tb = (df["_t"].astype(str) + "\x1f" + key).value_counts()
            out.append(pd.DataFrame({"kind": "tb:" + name,
                                     "key": tb.index.astype(str),
                                     "n": tb.to_numpy()}))
        tv = df["_t"].astype(str).value_counts()
        out.append(pd.DataFrame({"kind": "t", "key": tv.index.astype(str),
                                 "n": tv.to_numpy()}))
        out.append(pd.DataFrame({"kind": ["__n__"], "key": [""],
                                 "n": [len(df)]}))
        return pd.concat(out, ignore_index=True)

    grouped = (ds.map_batches(partials, batch_format="pyarrow")
               .groupby(["kind", "key"]).sum("n").to_pandas())
    counts = {(r[0], r[1]): int(r[2]) for r in
              grouped.itertuples(index=False)}

    def pairs_of(kind: str) -> int:
        return sum(n * (n - 1) // 2 for (k, _), n in counts.items()
                   if k == kind)

    n_rows = counts[("__n__", "")]
    total_pairs = n_rows * (n_rows - 1) // 2
    truth_pairs = pairs_of("t")
    rows = []
    for name in schemes:
        cand = pairs_of("b:" + name)
        captured = pairs_of("tb:" + name)
        rows.append((name, cand, truth_pairs, captured,
                     1.0 - cand / total_pairs,
                     captured / truth_pairs if truth_pairs else float("nan")))
    out = pd.DataFrame(rows, columns=[
        "scheme", "n_candidate_pairs", "n_truth_pairs", "n_captured_pairs",
        "reduction_ratio", "pairs_completeness"])
    return out.sort_values("scheme").reset_index(drop=True)


def pair_comparisons_with_seg(sf_dir: str):
    """``pair_comparisons`` variant that carries the (shared-block)
    left record's segment value, for term-frequency adjustment."""
    feats = _customer_features(sf_dir)

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="c_nationkey", suffixes=("_l", "_r"))
        m = m[m["c_custkey_l"] < m["c_custkey_r"]]
        d = np.abs(m["cents_l"].to_numpy() - m["cents_r"].to_numpy())
        g_bal = np.where(d < 10_000, 2, np.where(d < 100_000, 1, 0))
        return pd.DataFrame({
            "custkey_l": m["c_custkey_l"].to_numpy(),
            "custkey_r": m["c_custkey_r"].to_numpy(),
            "seg": m["seg_l"].to_numpy(),
            "g_name": (m["name3_l"].to_numpy() ==
                       m["name3_r"].to_numpy()).astype("int64"),
            "g_seg": (m["seg_l"].to_numpy() ==
                      m["seg_r"].to_numpy()).astype("int64"),
            "g_bal": g_bal.astype("int64")})

    return _block_buckets(feats).map_groups(
        lambda g: expand(g.drop(columns=["_b"])), batch_format="pandas")


def tf_adjusted_posteriors(sf_dir: str, lam: float = FIXED_LAMBDA,
                           m=FIXED_M, u=FIXED_U):
    """Splink-style term-frequency adjustment of the Fellegi–Sunter
    posterior: when a pair AGREES on the segment field, the generic
    agreement-u (``FIXED_U['g_seg'][1]``) is replaced by that value's
    observed relative frequency ``p_v = n_v / n`` — agreeing on a rare
    value is stronger evidence than agreeing on a common one (Splink's
    ``tf_adjustments``; Winkler's frequency-based matching).

    Distributed shape: the term-frequency table is a per-batch
    ``value_counts`` combiner → tiny groupby (|distinct values| rows)
    → one ``ray.put`` broadcast; scoring stays a stateless shuffle-free
    map.  ``p_v`` is ONE double division of exact integer counts and
    the multiply chain order is pinned, so the posterior doubles are
    bit-identical to the DuckDB oracle."""
    import ray

    from .relational import read

    fields = list(CUSTOMER_FIELDS)
    ma, ua = _as_param_arrays(m, u, fields)

    seg_counts = (read(sf_dir, "customer", columns=["c_mktsegment"])
                  .map_batches(
                      lambda df: df["c_mktsegment"].value_counts()
                      .rename_axis("seg").reset_index(name="n"),
                      batch_format="pandas")
                  .groupby("seg").sum("n").to_pandas())
    n_total = int(seg_counts["sum(n)"].sum())
    tf = {r.seg: int(r[1]) for r in seg_counts.itertuples(index=False)}
    tf_ref = ray.put((tf, n_total))

    def score(t: pa.Table, _ref=tf_ref) -> pd.DataFrame:
        tfd, n = ray.get(_ref)
        seg = t["seg"].to_pandas()
        p_v = (seg.map(tfd).to_numpy(dtype="float64")
               / np.float64(n))
        gv = {f: t[f].to_numpy(zero_copy_only=False) for f in fields}
        num = np.full(t.num_rows, lam, dtype="float64")
        for f in fields:
            num = num * ma[f][gv[f]]
        den_u = np.full(t.num_rows, 1.0 - lam, dtype="float64")
        den_u = den_u * ua["g_name"][gv["g_name"]]
        den_u = den_u * np.where(gv["g_seg"] == 1, p_v,
                                 ua["g_seg"][0])
        den_u = den_u * ua["g_bal"][gv["g_bal"]]
        return pd.DataFrame({
            "custkey_l": t["custkey_l"].to_numpy(zero_copy_only=False),
            "custkey_r": t["custkey_r"].to_numpy(zero_copy_only=False),
            "seg": seg.to_numpy(),
            **gv,
            "posterior": num / (num + den_u)})

    return (pair_comparisons_with_seg(sf_dir)
            .map_batches(score, batch_format="pyarrow")
            .sort(["custkey_l", "custkey_r"]))


def golden_records(sf_dir: str, cluster_mod: int = 50,
                   buckets: int = 32):
    """Survivorship / golden-record construction (the MDM step after
    clustering, Christen *Data Matching* §10): collapse each entity
    cluster to ONE canonical record with per-field survivorship rules —
    most-frequent value with a deterministic smallest-value tie-break
    for categorical fields (name, segment), max for size-like fields
    (account balance), min for stable ids.  Cluster ids here are the
    planted ``c_custkey % cluster_mod`` (stands in for ``linkage``
    cluster output, whose ids aren't SQL-derivable).

    One cluster-hash bucket shuffle; inside each bucket the mode is a
    vectorized two-level groupby (count → sort → head(1)) — no
    per-cluster Ray groups, no driver pull.  ``max_bal`` is a
    SELECTION (not arithmetic) so the double is hash-safe as-is."""
    from .relational import read

    ds = read(sf_dir, "customer",
              columns=["c_custkey", "c_name", "c_acctbal",
                       "c_mktsegment"])

    def add_b(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["cluster"] = df["c_custkey"] % cluster_mod
        with np.errstate(over="ignore"):
            h = (df["cluster"].to_numpy().astype("uint64")
                 * np.uint64(0x9E3779B97F4A7C15))
        df["_b"] = (h % np.uint64(buckets)).astype("int64")
        return df

    def survivorship(g: pd.DataFrame) -> pd.DataFrame:
        base = (g.groupby("cluster")
                .agg(n_members=("c_custkey", "size"),
                     max_bal=("c_acctbal", "max"),
                     min_custkey=("c_custkey", "min"))
                .reset_index())

        def mode_of(col: str) -> pd.Series:
            c = (g.groupby(["cluster", col]).size()
                 .reset_index(name="cnt")
                 .sort_values(["cluster", "cnt", col],
                              ascending=[True, False, True],
                              kind="mergesort"))
            return (c.groupby("cluster", sort=False).head(1)
                    .set_index("cluster")[col])

        base["name"] = base["cluster"].map(mode_of("c_name"))
        base["segment"] = base["cluster"].map(mode_of("c_mktsegment"))
        base["n_members"] = base["n_members"].astype("int64")
        return base[["cluster", "n_members", "name", "segment",
                     "max_bal", "min_custkey"]]

    return (ds.map_batches(add_b, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: survivorship(g.drop(columns=["_b"])),
                batch_format="pandas")
            .sort("cluster"))


def sorted_neighborhood_pairs(sf_dir: str, window: int = 5,
                              buckets: int = 32):
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): order
    all records by a sort key and emit every pair within ``window``
    rank positions — the classic alternative to hash blocking when
    near-duplicates share key *proximity* rather than key equality.
    Sort key here: (integer account-balance cents, custkey) — total
    and deterministic.

    Distributed shape (the part hash blocking doesn't need): records
    range-partition by sort-key value into ``buckets`` (fixed bounds —
    the TPC-H balance domain is known; at 100 TB you'd sample
    quantile bounds like ``Dataset.sort`` does, correctness is
    unaffected by imbalance).  Pass A (one bucket shuffle over slim
    (custkey, cents) rows) computes per-bucket counts and each
    bucket's top-``window`` rows; the driver folds that B×w-bounded
    summary into global rank offsets and per-bucket carry rows — the
    w global predecessors of a bucket's first row are necessarily in
    some bucket's top-w, so the carry is exact.  Pass B (second
    bucket shuffle) sorts each bucket locally, assigns contiguous
    global ranks from the broadcast offsets, prepends the carry, and
    emits rank-adjacent pairs vectorized (one shifted-zip per rank
    distance d ≤ w); pairs whose higher-ranked element is a carry row
    belong to the previous bucket and are skipped, so no pair is
    duplicated.  Driver state is O(buckets·window) — never the data.
    """
    import ray

    from .relational import read

    LO, HI = -100_000, 1_000_000  # cents domain (TPC-H acctbal ±)
    span = HI - LO + 1

    ds = read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def slim(t: pa.Table) -> pd.DataFrame:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100.0 + 0.5).astype("int64")
        b = np.clip((cents - LO) * buckets // span, 0, buckets - 1)
        return pd.DataFrame({
            "custkey": t["c_custkey"].to_numpy(zero_copy_only=False),
            "cents": cents, "_b": b.astype("int64")})

    keyed = ds.map_batches(slim, batch_format="pyarrow")

    def bucket_summary(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "custkey"], kind="mergesort")
        top = g.tail(window).copy()
        top["from_end"] = np.arange(len(top))[::-1]  # 0 = largest
        top["n"] = len(g)
        return top[["_b", "n", "cents", "custkey", "from_end"]]

    summ = (keyed.groupby("_b").map_groups(bucket_summary,
                                           batch_format="pandas")
            .to_pandas())  # ≤ buckets×window rows — bounded driver pull
    counts = (summ.groupby("_b")["n"].first()
              .reindex(range(buckets), fill_value=0))
    offsets = counts.cumsum().shift(fill_value=0).astype("int64")
    # global rank of a top row: offset + n - 1 - from_end
    summ["grank"] = (offsets.loc[summ["_b"]].to_numpy()
                     + summ["n"].to_numpy() - 1
                     - summ["from_end"].to_numpy())
    pool = summ.sort_values("grank")
    carry = {}
    for b in range(buckets):
        prev = pool[pool["grank"] < offsets.loc[b]].tail(window)
        carry[b] = (prev["custkey"].to_numpy("int64"),
                    prev["cents"].to_numpy("int64"),
                    prev["grank"].to_numpy("int64"))
    ref = ray.put((dict(offsets), carry))

    def emit_pairs(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs, car = ray.get(_ref)
        b = int(g["_b"].iloc[0])
        g = g.sort_values(["cents", "custkey"], kind="mergesort")
        ck, cc, cr = car[b]
        keys = np.concatenate([ck, g["custkey"].to_numpy("int64")])
        n_carry = len(ck)
        outs = []
        for d in range(1, window + 1):
            if d >= len(keys):
                break
            a = keys[:-d]
            c = keys[d:]
            # keep pairs whose higher-ranked element is a LOCAL row
            keep = np.arange(d, len(keys)) >= n_carry
            a, c = a[keep], c[keep]
            outs.append(pd.DataFrame({
                "custkey_l": np.minimum(a, c),
                "custkey_r": np.maximum(a, c),
                "rank_dist": np.full(len(a), d, dtype="int64")}))
        if not outs:
            return pd.DataFrame({"custkey_l": pd.Series([], dtype="int64"),
                                 "custkey_r": pd.Series([], dtype="int64"),
                                 "rank_dist": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    return (keyed.groupby("_b").map_groups(emit_pairs,
                                           batch_format="pandas")
            .sort(["custkey_l", "custkey_r"]))


def name_jaro(sf_dir: str):
    """Jaro name similarity over the blocked candidate pairs — the
    first DuckDB-ORACLED surface for the fuzzy string-metric family
    (previously pytest-only by nature).  Our
    ``fuzzy.jaro_winkler(prefix_weight=0)`` is bit-identical to DuckDB
    ``jaro_similarity(a, b) * 100.0::DOUBLE`` (verified on 8k
    adversarial pairs incl. transpositions, containments, empties —
    the Winkler prefix boost is what differs between engines, pure
    Jaro does not).  Pair expansion carries the name strings; the
    metric runs through ``apply_unique_pairs`` so repeated names cost
    one DP each.  Stateless map after the one blocking shuffle."""
    from address_address_matching_ray.functions.fuzzy import (
        apply_unique_pairs,
        jaro_winkler,
    )

    from .relational import read

    ds = read(sf_dir, "customer",
              columns=["c_custkey", "c_name", "c_nationkey"])

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="c_nationkey", suffixes=("_l", "_r"))
        m = m[m["c_custkey_l"] < m["c_custkey_r"]]
        return pd.DataFrame({
            "custkey_l": m["c_custkey_l"].to_numpy(),
            "custkey_r": m["c_custkey_r"].to_numpy(),
            "name_l": m["c_name_l"].to_numpy(),
            "name_r": m["c_name_r"].to_numpy()})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        jw = apply_unique_pairs(
            lambda As, Bs: np.array(
                [jaro_winkler(a, b, prefix_weight=0.0)
                 for a, b in zip(As, Bs)], dtype="float64"),
            df["name_l"].to_numpy(object), df["name_r"].to_numpy(object))
        return pd.DataFrame({"custkey_l": df["custkey_l"],
                             "custkey_r": df["custkey_r"],
                             "jaro": jw})

    return (_block_buckets(ds).map_groups(
        lambda g: expand(g.drop(columns=["_b"])), batch_format="pandas")
        .map_batches(score, batch_format="pandas")
        .sort(["custkey_l", "custkey_r"]))


def name_levenshtein(sf_dir: str):
    """Levenshtein edit distance between paired record names over the
    blocked candidate pairs — integer-valued (Myers bit-parallel,
    ``fuzzy.levenshtein``), so the DuckDB ``levenshtein`` oracle is
    hash-exact with no float care.  Same one-shuffle blocking +
    stateless scoring-map shape as ``name_jaro``."""
    from address_address_matching_ray.functions.fuzzy import (
        apply_unique_pairs,
        batch_levenshtein,
    )

    from .relational import read

    ds = read(sf_dir, "customer",
              columns=["c_custkey", "c_name", "c_nationkey"])

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="c_nationkey", suffixes=("_l", "_r"))
        m = m[m["c_custkey_l"] < m["c_custkey_r"]]
        return pd.DataFrame({
            "custkey_l": m["c_custkey_l"].to_numpy(),
            "custkey_r": m["c_custkey_r"].to_numpy(),
            "name_l": m["c_name_l"].to_numpy(),
            "name_r": m["c_name_r"].to_numpy()})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dist = apply_unique_pairs(
            batch_levenshtein,
            df["name_l"].to_numpy(object), df["name_r"].to_numpy(object))
        return pd.DataFrame({"custkey_l": df["custkey_l"],
                             "custkey_r": df["custkey_r"],
                             "dist": dist.astype("int64")})

    return (_block_buckets(ds).map_groups(
        lambda g: expand(g.drop(columns=["_b"])), batch_format="pandas")
        .map_batches(score, batch_format="pandas")
        .sort(["custkey_l", "custkey_r"]))


def name_damerau(sf_dir: str):
    """Full Damerau–Levenshtein name distance over blocked pairs
    (``fuzzy.damerau_levenshtein``, Lowrance–Wagner) — integer-valued,
    hash-exact against DuckDB's full-variant ``damerau_levenshtein``.
    Same shape as ``name_levenshtein``."""
    from address_address_matching_ray.functions.fuzzy import (
        apply_unique_pairs,
        batch_damerau_levenshtein,
    )

    from .relational import read

    ds = read(sf_dir, "customer",
              columns=["c_custkey", "c_name", "c_nationkey"])

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="c_nationkey", suffixes=("_l", "_r"))
        m = m[m["c_custkey_l"] < m["c_custkey_r"]]
        return pd.DataFrame({
            "custkey_l": m["c_custkey_l"].to_numpy(),
            "custkey_r": m["c_custkey_r"].to_numpy(),
            "name_l": m["c_name_l"].to_numpy(),
            "name_r": m["c_name_r"].to_numpy()})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dist = apply_unique_pairs(
            batch_damerau_levenshtein,
            df["name_l"].to_numpy(object), df["name_r"].to_numpy(object))
        return pd.DataFrame({"custkey_l": df["custkey_l"],
                             "custkey_r": df["custkey_r"],
                             "dl_dist": dist.astype("int64")})

    return (_block_buckets(ds).map_groups(
        lambda g: expand(g.drop(columns=["_b"])), batch_format="pandas")
        .map_batches(score, batch_format="pandas")
        .sort(["custkey_l", "custkey_r"]))


def clerical_review_sample(sf_dir: str, lo: float = 0.01,
                           hi: float = 0.95, one_in: int = 2):
    """Clerical-review triage (the human-in-the-loop ER step): pairs
    whose match posterior falls in the uncertain band [lo, hi) —
    neither auto-link nor auto-reject — thinned by a deterministic
    Knuth-hash 1-in-``one_in`` sample so reviewer load is bounded and
    REPRODUCIBLE across runs and partitionings.  Shuffle-free filter
    over ``fs_posteriors`` (whose doubles are oracle-bit-identical, so
    the band predicate decides identically in SQL)."""

    def band(df: pd.DataFrame) -> pd.DataFrame:
        p = df["posterior"].to_numpy()
        h = (df["custkey_l"].to_numpy("int64") * 2654435761
             + df["custkey_r"].to_numpy("int64"))
        keep = (p >= lo) & (p < hi) & (h % one_in == 0)
        return df[keep][["custkey_l", "custkey_r", "posterior"]]

    return fs_posteriors(sf_dir).map_batches(band, batch_format="pandas")


#: Sweep grid for ``match_threshold_sweep`` — module-level literals so
#: the DuckDB oracle embeds the exact same decimal tokens.
SWEEP_THRESHOLDS = (0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45,
                    0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9,
                    0.95)


def match_threshold_sweep(sf_dir: str, lam: float = FIXED_LAMBDA,
                          m=FIXED_M, u=FIXED_U):
    """Threshold-selection sweep over the Fellegi–Sunter posterior
    (Splink's "choose a match threshold from the score distribution"
    analysis, done without labels): for every threshold t in
    ``SWEEP_THRESHOLDS`` report, under the model,

    * ``n_above``       — pairs with P(match|γ) ≥ t (the link volume),
    * ``exp_precision`` — E[#true matches above t] / n_above,
    * ``exp_recall``    — E[#true matches above t] / E[#true matches],
    * ``exp_f1``        — their harmonic mean,

    where E[#true matches in S] = Σ_{S} P(match|γ).

    Distributed shape: ONE shuffle-free streaming pass over the pair
    table; each batch emits exactly ``len(SWEEP_THRESHOLDS)`` partial
    rows (count + posterior mass above each threshold, via one sort +
    ``searchsorted`` per batch — not 19 elementwise scans), and the
    driver folds the tiny partial table.  Posterior mass accumulates
    in INTEGER micro-units (``floor(p·1e6)`` int64) so the reduce is
    summation-order-free and bit-identical to the DuckDB oracle
    (the ``embedding_kmeans``/``winsorized_stats`` recipe); the
    posterior doubles themselves are bit-identical per row (proven by
    the ``fs_posteriors`` oracle), so every ``p ≥ t`` decides the same
    way in SQL.  Ratios are computed once, on the driver, with pinned
    operation order."""
    fields = list(CUSTOMER_FIELDS)
    ma, ua = _as_param_arrays(m, u, fields)
    thr = np.asarray(SWEEP_THRESHOLDS, dtype="float64")
    nt = len(thr)

    def partial(t: pa.Table) -> pd.DataFrame:
        num = np.full(t.num_rows, lam, dtype="float64")
        den_u = np.full(t.num_rows, 1.0 - lam, dtype="float64")
        for f in fields:
            gv = t[f].to_numpy(zero_copy_only=False)
            num = num * ma[f][gv]
            den_u = den_u * ua[f][gv]
        p = num / (num + den_u)
        mu = np.floor(p * 1000000.0).astype("int64")
        order = np.argsort(p, kind="stable")
        ps = p[order]
        suffix = np.concatenate([np.cumsum(mu[order][::-1])[::-1],
                                 np.zeros(1, dtype="int64")])
        idx = np.searchsorted(ps, thr, side="left")  # first ps >= t
        return pd.DataFrame({
            "thr_i": np.arange(nt, dtype="int64"),
            "n_above": (len(ps) - idx).astype("int64"),
            "mu_above": suffix[idx],
            "mu_tot": np.full(nt, int(mu.sum()), dtype="int64")})

    pdf = (pair_comparisons(sf_dir)
           .map_batches(partial, batch_format="pyarrow")
           .to_pandas())                      # ≤ 19 rows per input batch
    g = (pdf.groupby("thr_i", sort=True)[["n_above", "mu_above", "mu_tot"]]
         .sum())
    n_above = g["n_above"].to_numpy(dtype="float64")
    mu_above = g["mu_above"].to_numpy(dtype="float64")
    mu_tot = g["mu_tot"].to_numpy(dtype="float64")
    with np.errstate(invalid="ignore", divide="ignore"):
        prec = (mu_above / 1000000.0) / n_above
        rec = mu_above / mu_tot
        f1 = ((2.0 * prec) * rec) / (prec + rec)
    zero = g["n_above"].to_numpy() == 0
    prec[zero] = 0.0
    f1[zero | ((prec + rec) == 0.0)] = 0.0
    return pd.DataFrame({
        "threshold": thr,
        "n_above": g["n_above"].to_numpy(dtype="int64"),
        "exp_precision": prec,
        "exp_recall": rec,
        "exp_f1": f1})


def one_to_one_matches(sf_dir: str, floor: float = 0.2,
                       lam: float = FIXED_LAMBDA, m=FIXED_M, u=FIXED_U,
                       buckets: int = 64):
    """1:1 assignment over the scored candidate pairs — mutual-
    nearest-neighbor matching (reciprocal best hit): keep pair (a, b)
    iff b is a's highest-posterior neighbor AND a is b's, with a
    posterior floor.  This is the deterministic, shuffle-friendly
    stand-in for the assignment step an ER system runs after scoring
    (the reference keeps only the best candidate per query,
    ultimate_address_matcher.py:868-1050, but never enforces that a
    candidate is not claimed by two queries; MNN adds exactly that
    one-to-one guarantee and is the standard greedy-matching
    first round).

    Ties (the posterior is DISCRETE — one value per gamma vector) are
    broken by the smaller neighbor key, so the argmax is associative
    and the per-batch combiner below is exact.

    Distributed shape (pair table never re-materialized, 2 bucketed
    shuffles over slim int rows):
      1. score + floor-filter each batch (stateless, shuffle-free);
         explode each kept pair into its 2 directed (k, nbr) rows;
      2. per-batch argmax per k (lexsort + first-occurrence mask — a
         vectorized combiner, exact by associativity) → ≤1 row per
         (k, batch); ONE hash(k)-bucket shuffle finishes the argmax;
      3. bucket the per-entity best rows by the UNORDERED pair hash,
         so (a→b) and (b→a) land in one bucket; a pair with both
         directions present is mutual.  Output (custkey_l < custkey_r,
         posterior), sorted.

    The posterior doubles are bit-identical to the DuckDB oracle per
    row (``fs_posteriors`` parity), so `p >= floor` and the
    posterior-DESC sorts decide identically in SQL."""
    fields = list(CUSTOMER_FIELDS)
    ma, ua = _as_param_arrays(m, u, fields)
    mix = np.uint64(0x9E3779B97F4A7C15)

    def directed_best(t: pa.Table) -> pd.DataFrame:
        num = np.full(t.num_rows, lam, dtype="float64")
        den_u = np.full(t.num_rows, 1.0 - lam, dtype="float64")
        for f in fields:
            gv = t[f].to_numpy(zero_copy_only=False)
            num = num * ma[f][gv]
            den_u = den_u * ua[f][gv]
        p = num / (num + den_u)
        keep = p >= floor
        l = t["custkey_l"].to_numpy(zero_copy_only=False)[keep]
        r = t["custkey_r"].to_numpy(zero_copy_only=False)[keep]
        p = p[keep]
        k = np.concatenate([l, r])
        nbr = np.concatenate([r, l])
        pp = np.concatenate([p, p])
        # per-batch argmax combiner: key asc, posterior desc, nbr asc
        order = np.lexsort((nbr, -pp, k))
        k, nbr, pp = k[order], nbr[order], pp[order]
        first = (np.concatenate([[True], k[1:] != k[:-1]])
                 if len(k) else np.zeros(0, dtype=bool))
        out = pd.DataFrame({"k": k[first], "nbr": nbr[first],
                            "posterior": pp[first]})
        out["_b"] = (out["k"].to_numpy().astype("uint64") * mix
                     % np.uint64(buckets)).astype("int64")
        return out

    def bucket_best(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy()
        nbr = g["nbr"].to_numpy()
        pp = g["posterior"].to_numpy()
        order = np.lexsort((nbr, -pp, k))
        k, nbr, pp = k[order], nbr[order], pp[order]
        first = (np.concatenate([[True], k[1:] != k[:-1]])
                 if len(k) else np.zeros(0, dtype=bool))
        out = pd.DataFrame({"k": k[first], "nbr": nbr[first],
                            "posterior": pp[first]})
        lo = np.minimum(out["k"].to_numpy(), out["nbr"].to_numpy())
        hi = np.maximum(out["k"].to_numpy(), out["nbr"].to_numpy())
        with np.errstate(over="ignore"):
            out["_b2"] = (((lo.astype("uint64") * mix)
                           ^ hi.astype("uint64"))
                          % np.uint64(buckets)).astype("int64")
        return out

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        lo = np.minimum(g["k"].to_numpy(), g["nbr"].to_numpy())
        hi = np.maximum(g["k"].to_numpy(), g["nbr"].to_numpy())
        pair = pd.DataFrame({"custkey_l": lo, "custkey_r": hi,
                             "posterior": g["posterior"].to_numpy()})
        dupd = pair.groupby(["custkey_l", "custkey_r"], sort=False,
                            as_index=False).agg(
            posterior=("posterior", "first"), n=("posterior", "size"))
        both = dupd[dupd["n"] == 2]
        return both[["custkey_l", "custkey_r", "posterior"]]

    return (pair_comparisons(sf_dir)
            .map_batches(directed_best, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: bucket_best(g.drop(columns=["_b"])),
                batch_format="pandas")
            .groupby("_b2").map_groups(
                lambda g: mutual(g.drop(columns=["_b2"])),
                batch_format="pandas")
            .sort(["custkey_l", "custkey_r"]))


# deterministic segment codes shared with the DuckDB oracle's CASE
# mapping (TPC-H's five fixed market segments; unknown values -> 7)
SEGMENT_CODES: dict[str, int] = {
    "AUTOMOBILE": 0, "BUILDING": 1, "FURNITURE": 2,
    "HOUSEHOLD": 3, "MACHINERY": 4}


def cluster_pair_metrics(labels_ds, *, pred_col: str = "pred",
                         truth_col: str = "truth", buckets: int = 64,
                         micro: int = 1_000_000) -> pd.DataFrame:
    """Clustering-quality evaluation for entity resolution: pairwise
    precision/recall/F1 and B-cubed precision/recall/F1 (Bagga &
    Baldwin 1998; the standard ER cluster metrics, e.g. Menestrina et
    al. "Evaluating entity resolution results", VLDB 2010) of a
    predicted clustering against truth labels.

    Everything reduces to the (pred, truth) CONTINGENCY CELLS — no
    record pair is ever materialized:

      pairwise: TP = Σ_cells C(n,2);  pred_pairs = Σ_p C(n_p,2);
                truth_pairs = Σ_t C(n_t,2)
      B³ precision = (1/N) Σ_cells n²/n_p;  recall = (1/N) Σ n²/n_t

    Distributed shape: per-batch cell-count combiner → ONE pred-hash
    bucketed sum collapses cells globally (``join.bucketed_sum`` —
    cells are slim int rows, ≤ one per (cell, batch) on the wire) →
    two bucketed scalar passes (by pred / by truth: a bucket holds ALL
    cells of its pred (resp. truth) clusters, so n_p / n_t and the B³
    terms are bucket-local) → the driver folds O(buckets) scalar rows.

    Float discipline (hash-oracle-exact): all sums are integers; the
    B³ terms are integer micro-units ``(n²·micro) // n_p`` (floor
    division matches DuckDB ``//``; ``micro=1e6`` keeps ``n²·micro``
    inside int64 for per-(pred,truth) CELL counts up to ~3M — beyond
    that the B³ term auto-widens to exact python-int arithmetic
    rather than aborting; cluster SIZES only ever appear as divisors
    and pair counts, both int64-safe); the only
    double arithmetic is the final per-metric expression, computed in
    the same operation order as the oracle SQL."""
    from .join import bucketed_sum

    mix = np.uint64(0x9E3779B97F4A7C15)

    def cell_partials(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "pred": t[pred_col].to_numpy(zero_copy_only=False),
            "truth": t[truth_col].to_numpy(zero_copy_only=False)})
        g = df.groupby(["pred", "truth"], as_index=False, sort=False)
        out = g.size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    cells = bucketed_sum(
        labels_ds.map_batches(cell_partials, batch_format="pyarrow"),
        ["pred", "truth"], ["n"], buckets=buckets,
        # pinned barrier consumed by BOTH scalar passes below; worst
        # case (near-singleton clusters) is one 24 B row per record —
        # ~2% of corpus bytes, object-store-spillable — vs re-deriving
        # the full input twice
        bucket_on="pred").materialize()

    def side_partials(g: pd.DataFrame, side: str) -> pd.DataFrame:
        n = g["n"].to_numpy().astype("int64")
        sizes = g.groupby(side)["n"].transform("sum").to_numpy()
        csz = g.groupby(side)["n"].sum().to_numpy().astype("int64")
        if n.max(initial=0) < 3_000_000:
            # n is the squared operand: n²·micro stays inside int64 for
            # CELL counts (not cluster sizes) below ~3M
            b3 = int(((n * n * micro) // sizes).sum())
        else:
            # auto-widen to python-int (exact, arbitrary precision)
            # instead of aborting the job mid-map_groups; only the
            # rare giant-cell regime pays the object-array cost
            b3 = int(((n.astype(object) * n.astype(object) * micro)
                      // sizes.astype(object)).sum())
        return pd.DataFrame({
            "n_records": [int(n.sum())],
            "n_clusters": [len(csz)],
            "cluster_pairs": [int((csz * (csz - 1) // 2).sum())],
            "tp_pairs": [int((n * (n - 1) // 2).sum())],
            "b3_microsum": [b3]})

    def tag(side: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            with np.errstate(over="ignore"):
                h = df[side].to_numpy().astype("uint64") * mix
            df["_b"] = (h % np.uint64(buckets)).astype("int64")
            return df
        return f

    def fold(side: str) -> pd.Series:
        parts = (cells.map_batches(tag(side), batch_format="pandas")
                 .groupby("_b").map_groups(
                     lambda g: side_partials(g.drop(columns=["_b"]), side),
                     batch_format="pandas")
                 .to_pandas())          # O(buckets) scalar rows
        return parts.sum()

    a, b = fold("pred"), fold("truth")
    if len(a) == 0 or int(a.get("n_records", 0)) == 0:
        # empty input: all-zero metrics rather than a NaN crash (the
        # empty-write lesson from sources/sink.py)
        return pd.DataFrame({"metric": [
            "ari", "b3_f1", "b3_precision", "b3_recall",
            "fowlkes_mallows", "n_pred_clusters", "n_records",
            "n_truth_clusters", "pairwise_f1", "pairwise_precision",
            "pairwise_recall", "pred_pairs", "tp_pairs",
            "truth_pairs"], "value": [0.0] * 14})
    n_rec, tp = int(a["n_records"]), int(a["tp_pairs"])
    pred_pairs, truth_pairs = int(a["cluster_pairs"]), int(b["cluster_pairs"])
    # final doubles: ONE pinned expression per metric, identical to SQL
    p = tp / pred_pairs if pred_pairs else 0.0
    r = tp / truth_pairs if truth_pairs else 0.0
    f1 = 2.0 * p * r / (p + r) if (p + r) > 0 else 0.0
    b3p = (int(a["b3_microsum"]) / float(micro)) / n_rec
    b3r = (int(b["b3_microsum"]) / float(micro)) / n_rec
    b3f = 2.0 * b3p * b3r / (b3p + b3r) if (b3p + b3r) > 0 else 0.0
    # Adjusted Rand Index (Hubert & Arabie 1985) from the same pair
    # sums; expected-index term and both ratios in pinned double order
    tot_pairs = n_rec * (n_rec - 1) // 2
    e = (float(pred_pairs) * float(truth_pairs) / float(tot_pairs)
         if tot_pairs else 0.0)
    ari_den = 0.5 * (float(pred_pairs) + float(truth_pairs)) - e
    ari = (float(tp) - e) / ari_den if ari_den != 0.0 else 0.0
    # Fowlkes-Mallows = sqrt(precision * recall); IEEE sqrt is
    # correctly rounded, so the double matches SQL bit-for-bit
    fm = math.sqrt(p * r)
    out = pd.DataFrame({"metric": [
        "ari", "b3_f1", "b3_precision", "b3_recall",
        "fowlkes_mallows", "n_pred_clusters", "n_records",
        "n_truth_clusters", "pairwise_f1", "pairwise_precision",
        "pairwise_recall", "pred_pairs", "tp_pairs", "truth_pairs"],
        "value": [ari, b3f, b3p, b3r, fm, float(int(a["n_clusters"])),
                  float(n_rec), float(int(b["n_clusters"])), f1, p, r,
                  float(pred_pairs), float(tp), float(truth_pairs)]})
    return out


def cluster_eval(sf_dir: str, truth_mod: int = TRUTH_MOD,
                 buckets: int = 64) -> pd.DataFrame:
    """Query surface: evaluate the ``nation_segment`` blocking scheme
    AS a clustering (its resolution upper bound) against the planted
    duplicate truth ``c_custkey % truth_mod`` — the same truth key
    ``blocking_metrics`` and ``golden_records`` use.  Pairwise P/R here
    relate to ``blocking_metrics``' pairs-completeness (recall is
    captured/truth pairs for the same scheme); B³ adds the per-record
    view those pair counts can't see."""
    from .relational import read

    ds = read(sf_dir, "customer",
              columns=["c_custkey", "c_nationkey", "c_mktsegment"])

    def lab(t: pa.Table) -> pd.DataFrame:
        seg = (t["c_mktsegment"].to_pandas().map(SEGMENT_CODES)
               .fillna(7).astype("int64"))
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "pred": nk.astype("int64") * 8 + seg.to_numpy(),
            "truth": (t["c_custkey"].to_numpy(zero_copy_only=False)
                      % truth_mod).astype("int64")})

    return cluster_pair_metrics(
        ds.map_batches(lab, batch_format="pyarrow"), buckets=buckets)


def meta_blocking_pairs(sf_dir: str, max_block_size: int = 1000,
                        buckets: int = 64):
    """Meta-blocking (Papadakis et al., "Meta-Blocking: Taking Entity
    Resolution to the Next Level", TKDE 2014): treat the union of
    blocking schemes as a BLOCK GRAPH — records are nodes, an edge
    joins every co-blocked pair, weighted by how many blocks share it
    (CBS, common-blocks scheme) — then prune low-evidence edges.  Two
    standard steps:

      1. block purging: drop blocks larger than ``max_block_size``
         (oversized blocks are near-useless evidence and quadratic
         cost — the reason meta-blocking exists);
      2. weighted-edge pruning (WEP): keep edges with weight strictly
         above the global mean, compared in INTEGERS
         (``w · n_edges > Σw``) so no float mean is ever formed.

    Distributed shape: block membership rows are slim (block_id,
    custkey) int64 pairs; ONE block-hash bucket shuffle makes purge
    sizes and pair expansion bucket-local (all rows of one block
    co-locate — the ``pair_comparisons`` recipe); pair weights
    collapse through ``join.bucketed_sum``; the edge table is
    materialized ONCE as an explicit barrier (the containment-join
    lesson: pinned handoffs beat one mega-DAG) and consumed by the
    O(batches)-row total fold and the final filter.  Output pairs are
    exact integers end-to-end — hash-oracle-exact by construction."""
    from .join import bucketed_sum
    from .relational import read

    mix = np.uint64(0x9E3779B97F4A7C15)
    ds = read(sf_dir, "customer",
              columns=["c_custkey", "c_nationkey", "c_mktsegment"])

    def membership(t: pa.Table) -> pd.DataFrame:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype("int64")
        nk = (t["c_nationkey"].to_numpy(zero_copy_only=False)
              .astype("int64"))
        sg = (t["c_mktsegment"].to_pandas().map(SEGMENT_CODES)
              .fillna(7).astype("int64").to_numpy())
        base = np.int64(1) << 32
        block = np.concatenate([nk, base + sg, 2 * base + nk * 8 + sg])
        out = pd.DataFrame({"block_id": block, "custkey": np.tile(k, 3)})
        with np.errstate(over="ignore"):
            h = out["block_id"].to_numpy().astype("uint64") * mix
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        return out

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby("block_id")["custkey"].transform("size")
        g = g[sz.to_numpy() <= max_block_size]
        m = g.merge(g, on="block_id")
        m = m[m["custkey_x"] < m["custkey_y"]]
        out = (m.groupby(["custkey_x", "custkey_y"], as_index=False,
                         sort=False).size()
               .rename(columns={"custkey_x": "l", "custkey_y": "r",
                                "size": "w"}))
        out["w"] = out["w"].astype("int64")
        return out

    pairs = (ds.map_batches(membership, batch_format="pyarrow")
             .groupby("_b").map_groups(
                 lambda g: expand(g.drop(columns=["_b"])),
                 batch_format="pandas"))
    weights = bucketed_sum(pairs, ["l", "r"], ["w"], buckets=buckets,
                           bucket_on="l").materialize()

    tot = (weights.map_batches(
        lambda df: pd.DataFrame({"ne": [len(df)],
                                 "sw": [int(df["w"].sum())]}),
        batch_format="pandas").to_pandas().sum())   # O(batches) rows
    n_edges, sum_w = int(tot["ne"]), int(tot["sw"])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["w"].to_numpy() * n_edges > sum_w
        out = df[keep].rename(columns={"l": "custkey_l",
                                       "r": "custkey_r"})
        return out[["custkey_l", "custkey_r", "w"]]

    return (weights.map_batches(prune, batch_format="pandas")
            .sort(["custkey_l", "custkey_r"]))


def name_monge_elkan(sf_dir: str, buckets: int = 64):
    """Monge–Elkan hybrid similarity (Monge & Elkan 1996; the standard
    token-level/character-level hybrid for multi-word names): for each
    left token take the best Jaro score against any right token, then
    average — both directions, since ME is asymmetric.  Runs over
    brand-blocked part-name pairs (``p_name`` is multi-token).

    Oracle-exactness recipe: the inner Jaro is bit-identical to DuckDB
    ``jaro_similarity * 100.0`` (the ``name_jaro`` parity); max is
    order-free; each per-token max is floored to int64 1e-10 micro
    units so the per-pair sum is exact integers-in-doubles (≤ 5·10¹²
    ≪ 2⁵³); the final mean is ONE pinned double expression
    ``(Σ / 1e10) / n_tokens`` on both sides.  Token loops run once per
    DISTINCT name pair (``apply_unique_pairs``); token counts are tiny
    (2-3), so the kernel stays vectorized-amortized."""
    from address_address_matching_ray.functions.fuzzy import (
        apply_unique_pairs,
        jaro_winkler,
    )

    from .relational import read

    mix = np.uint64(0x9E3779B97F4A7C15)
    ds = read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_name"])

    def add_b(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        codes = pd.util.hash_array(
            df["p_brand"].to_numpy(object)).astype("uint64")
        with np.errstate(over="ignore"):
            df["_b"] = ((codes * mix) % np.uint64(buckets)).astype("int64")
        return df

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="p_brand", suffixes=("_l", "_r"))
        m = m[m["p_partkey_l"] < m["p_partkey_r"]]
        return pd.DataFrame({
            "partkey_l": m["p_partkey_l"].to_numpy(),
            "partkey_r": m["p_partkey_r"].to_numpy(),
            "name_l": m["p_name_l"].to_numpy(),
            "name_r": m["p_name_r"].to_numpy()})

    def me_one(a: str, b: str) -> float:
        ta, tb = a.split(" "), b.split(" ")
        s = 0
        for x in ta:
            best = max(jaro_winkler(x, y, prefix_weight=0.0) for y in tb)
            s += int(math.floor(best * 1e10))
        return (s / 1e10) / len(ta)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        nl = df["name_l"].to_numpy(object)
        nr = df["name_r"].to_numpy(object)
        lr = apply_unique_pairs(
            lambda As, Bs: np.array([me_one(a, b) for a, b in
                                     zip(As, Bs)], dtype="float64"),
            nl, nr)
        rl = apply_unique_pairs(
            lambda As, Bs: np.array([me_one(a, b) for a, b in
                                     zip(As, Bs)], dtype="float64"),
            nr, nl)
        return pd.DataFrame({"partkey_l": df["partkey_l"],
                             "partkey_r": df["partkey_r"],
                             "me_lr": lr, "me_rl": rl})

    return (ds.map_batches(add_b, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: expand(g.drop(columns=["_b"])),
                batch_format="pandas")
            .map_batches(score, batch_format="pandas")
            .sort(["partkey_l", "partkey_r"]))


def name_qgram_dice(sf_dir: str):
    """Q-gram (character-bigram) Dice similarity over the blocked
    candidate pairs — the set-based string metric ER systems use when
    edit-distance DP is too slow (Christen *Data Matching* §5.4):
    ``2·|A∩B| / (|A|+|B|)`` over the DISTINCT bigram sets.  All set
    sizes are integers, so the only float is ONE pinned division —
    hash-oracle-exact against DuckDB's list-comprehension replay.
    Bigram sets are computed once per DISTINCT name pair
    (``apply_unique_pairs``); scoring is a stateless map after the one
    blocking shuffle (the ``name_jaro`` shape)."""
    from address_address_matching_ray.functions.fuzzy import (
        apply_unique_pairs,
    )

    from .relational import read

    ds = read(sf_dir, "customer",
              columns=["c_custkey", "c_name", "c_nationkey"])

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="c_nationkey", suffixes=("_l", "_r"))
        m = m[m["c_custkey_l"] < m["c_custkey_r"]]
        return pd.DataFrame({
            "custkey_l": m["c_custkey_l"].to_numpy(),
            "custkey_r": m["c_custkey_r"].to_numpy(),
            "name_l": m["c_name_l"].to_numpy(),
            "name_r": m["c_name_r"].to_numpy()})

    def dice_one(a: str, b: str) -> float:
        ba = {a[i:i + 2] for i in range(len(a) - 1)}
        bb = {b[i:i + 2] for i in range(len(b) - 1)}
        tot = len(ba) + len(bb)
        return 2.0 * len(ba & bb) / tot if tot else 0.0

    def score(df: pd.DataFrame) -> pd.DataFrame:
        d = apply_unique_pairs(
            lambda As, Bs: np.array([dice_one(a, b) for a, b in
                                     zip(As, Bs)], dtype="float64"),
            df["name_l"].to_numpy(object), df["name_r"].to_numpy(object))
        return pd.DataFrame({"custkey_l": df["custkey_l"],
                             "custkey_r": df["custkey_r"],
                             "dice": d})

    return (_block_buckets(ds).map_groups(
        lambda g: expand(g.drop(columns=["_b"])), batch_format="pandas")
        .map_batches(score, batch_format="pandas")
        .sort(["custkey_l", "custkey_r"]))


def posterior_calibration(sf_dir: str, bins: int = 20,
                          truth_mod: int = TRUTH_MOD,
                          lam: float = FIXED_LAMBDA,
                          m=FIXED_M, u=FIXED_U) -> pd.DataFrame:
    """Reliability diagram of the Fellegi–Sunter posteriors against
    the planted duplicate truth (``c_custkey % truth_mod``): per
    posterior bin, how often pairs actually match — the calibration
    check an ER team runs before trusting model scores as
    probabilities (Niculescu-Mizil & Caruana 2005 framing; Splink's
    "probability calibration" chart).

    Exactness discipline: the posterior doubles are bit-identical to
    the SQL chain (the ``fs_posteriors`` parity), bin assignment is
    ``min(floor(p·bins), bins-1)`` computed identically, predicted
    mass is summed as ``floor(p·1e6)`` int64 micro-units, and the two
    final ratios are ONE pinned double expression each.  Shuffle
    shape: per-batch combiner collapses to ≤ ``bins`` rows; the global
    reduce is a bounded-enum groupby (the native path is fine at ≤20
    keys) — scored pairs stream, nothing is listed or sorted."""
    from ray.data.aggregate import Sum

    scored = _scored_pairs(sf_dir, lam, m, u)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = df["posterior"].to_numpy()
        b = np.minimum((p * bins).astype("int64"), bins - 1)
        lab = ((df["custkey_l"].to_numpy() % truth_mod) ==
               (df["custkey_r"].to_numpy() % truth_mod)).astype("int64")
        p6 = np.floor(p * 1e6).astype("int64")
        out = pd.DataFrame({"bin": b, "n_pairs": 1, "n_match": lab,
                            "sum_p6": p6})
        return out.groupby("bin", as_index=False, sort=False).sum()

    agg = (scored.map_batches(partial, batch_format="pandas")
           .groupby("bin")
           .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                      Sum("n_match", alias_name="n_match"),
                      Sum("sum_p6", alias_name="sum_p6"))
           .sort("bin").to_pandas())    # ≤ bins rows — driver-safe
    n = agg["n_pairs"].to_numpy().astype("int64")
    return pd.DataFrame({
        "bin": agg["bin"].to_numpy().astype("int64"),
        "n_pairs": n,
        "n_match": agg["n_match"].to_numpy().astype("int64"),
        "avg_pred": (agg["sum_p6"].to_numpy().astype("int64")
                     / 1e6) / n,
        "frac_match": agg["n_match"].to_numpy().astype("int64") / n})
