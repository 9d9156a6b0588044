"""Query→records matching: the reference's primary API, distributed.

``match_queries(queries, records)`` reproduces
``UltimateAddressMatcher.match_address`` (U:868-952) / ``AddressMatcher
.batch_match`` (O:812-867) as a Ray Data pipeline: free-text query
addresses are linked against an address-records table (the "index",
FIXTURES.md F2 schema = IndexFieldMapping defaults O:94-109):

    queries ─► parse (O-parser, M5) + variant fan-out (M15) → key rows
    records ─► field-derived key rows (J1/J2 blocking predicates)
            ─► ONE groupby shuffle → cross-side candidate pairs
            ─► tiered scorer (P1-P5) → per-query best match (K1/K2)
            ─► quality / adjusted confidence / reliability (P6-P8)
            ─► UltimateMatchResult-shaped rows (P9) + n8n projection

Ranking collapse of the sequential cascade (documented delta, SURVEY
§7.2 hard part 1): winner = max by (unit-exact match, exactness flag,
confidence, then pid for determinism) — the reference's early-return
rules (unit match returns immediately U:938-939; exact/relaxed non-unit
hits keep searching when a unit is expected U:941-943) reduce to this
order-independent priority for pairs that co-block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from address_address_matching_ray.config import (
    KEY_FAMILY_TIER, TIER_CAPS, PipelineConfig,
)
from address_address_matching_ray.functions import scoring
from address_address_matching_ray.functions.normalize import (
    normalize, normalize_array, phonetic_code, phonetic_code_array,
)
from address_address_matching_ray.functions.parse import (
    generate_variants, parse_address, parse_components,
)

Q_PAYLOAD = ("q_street", "q_house", "q_unit", "q_city", "q_state", "q_zip",
             "q_norm", "query")
R_PAYLOAD = ("pid", "ADDRESS", "HOUSE", "STREET", "STRTYPE", "PREDIR",
             "CITY", "STATE", "ZIP_CODE", "APTNBR", "r_norm")


def _query_keys(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Parse each query and emit its blocking keys (variant fan-out
    bounded by cfg.max_variants — K3 caps)."""
    qids = batch["query_id"].to_pylist()
    queries = [q or "" for q in batch["query"].to_pylist()]
    rows = []
    for qid, q in zip(qids, queries):
        if not q.strip():
            continue                                   # M18 empty guard
        # primary-path parser for the scoring payload (the reference's
        # usaddress route; the regex fallback mangles house ranges and
        # ordinal-collapsed units — see parse_components docstring)
        c = parse_components(q)
        street = f"{c.street_name} {c.street_type}".strip()
        qn = normalize(q)
        payload = (street, c.house_number, c.unit, c.city, c.state,
                   c.zip_code, qn, q)
        keys: list[str] = []
        if qn:
            keys.append(f"e:{qn}")
        seen_comp: set[str] = set()
        # component keys from the U-parser over the query AND its
        # variants (M15 — the variant generator IS the key fan-out)
        for v in [q] + generate_variants(q, cfg.max_variants)[:cfg.variants_per_tier]:
            cv = parse_components(v)
            if cv.house_number and cv.street_name:
                sn = normalize(cv.street_name)
                first = sn.split()[0] if sn else ""
                for k in (f"h:{cv.house_number}|{sn}|{cv.zip_code}",
                          f"h2:{cv.house_number}|{sn}",
                          f"f:{cv.house_number}|{first}|{cv.zip_code}",
                          f"s:{cv.house_number}|{phonetic_code(sn)}|{cv.state.upper()}"):
                    if k not in seen_comp:
                        seen_comp.add(k)
                        keys.append(k)
        if not (c.house_number and c.street_name):
            # degraded query (semantic/phonetic/keyword tiers, U:894-905):
            # retrieve by street-ish keywords scoped to zip/state
            from address_address_matching_ray.functions.normalize import (
                extract_keywords,
            )

            scope = c.zip_code or c.state.upper()
            for kw in extract_keywords(normalize(q))[:3]:
                k = f"k:{kw}|{scope}"
                if k not in seen_comp:
                    seen_comp.add(k)
                    keys.append(k)
        for k in keys:
            rows.append((qid, k, *payload))
    cols = list(zip(*rows)) if rows else [[]] * (2 + len(Q_PAYLOAD))
    out = {"query_id": pa.array(list(cols[0]), pa.uint64()),
           "block_key": pa.array(list(cols[1]), pa.string())}
    for i, name in enumerate(Q_PAYLOAD):
        out[name] = pa.array(list(cols[2 + i]), pa.string())
    return pa.table(out)


def _record_keys(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Blocking keys from record fields (the J1 query-builder predicates
    re-expressed as keys).  Fully vectorized: each key family is one
    masked object-array concat — the ``KeyDeriver.__call__`` pattern
    (stages/keys.py:144-197).  The records side is the BIG side of the
    match (10^9 rows against thousands of queries); a per-row Python
    loop here was the stage."""
    import pyarrow.compute as pc

    def col_str(name: str) -> pa.Array:
        a = batch[name]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if not pa.types.is_string(a.type):
            a = a.cast(pa.string())
        return pc.fill_null(a, "")

    # street-derived pieces computed once per DISTINCT street (streets
    # repeat heavily); normalize_array/phonetic_code_array factorize
    # internally, the first-token split dedups here
    street_np = col_str("STREET").to_numpy(zero_copy_only=False)
    street_norm = normalize_array(street_np)
    r_norm = normalize_array(col_str("ADDRESS").to_numpy(zero_copy_only=False))
    codes, uniq = pd.factorize(street_norm)
    first_u = np.array([u.split(" ", 1)[0] if u else "" for u in uniq],
                       dtype=object)
    first = first_u[codes]

    house_pa, zip_pa = col_str("HOUSE"), col_str("ZIP_CODE")
    state_pa = pc.utf8_upper(col_str("STATE"))
    sn_pa = pa.array(street_norm, pa.string())
    rn_pa = pa.array(r_norm, pa.string())
    first_pa = pa.array(first, pa.string())
    phon_pa = pa.array(phonetic_code_array(street_norm), pa.string())

    house_np = house_pa.to_numpy(zero_copy_only=False)
    idx_e = np.flatnonzero(r_norm != "")
    idx_h = np.flatnonzero((house_np != "") & (street_norm != ""))
    idx_k = np.flatnonzero(street_norm != "")
    idx = np.concatenate(
        [idx_e, idx_h, idx_h, idx_h, idx_h, idx_k, idx_k]).astype(np.int64)
    if not len(idx):
        out = {"block_key": pa.array([], pa.string())}
        for name in R_PAYLOAD:
            out[name] = pa.array([], pa.string())
        return pa.table(out)

    # key families as C++ element-wise joins, row-selected by take
    J = pc.binary_join_element_wise
    te, th, tk = (pa.array(i) for i in (idx_e, idx_h, idx_k))
    keys = pa.concat_arrays([
        J("e:", rn_pa, "").take(te),
        J("h:", J(house_pa, sn_pa, zip_pa, "|"), "").take(th),
        J("h2:", J(house_pa, sn_pa, "|"), "").take(th),
        J("f:", J(house_pa, first_pa, zip_pa, "|"), "").take(th),
        J("s:", J(house_pa, phon_pa, state_pa, "|"), "").take(th),
        # keyword-tier retrieval targets (degraded queries)
        J("k:", J(first_pa, zip_pa, "|"), "").take(tk),
        J("k:", J(first_pa, state_pa, "|"), "").take(tk),
    ])
    idx_pa = pa.array(idx)
    out = {"block_key": keys}
    for name in R_PAYLOAD:
        src = rn_pa if name == "r_norm" else col_str(name)
        out[name] = src.take(idx_pa)
    return pa.table(out)


def _score_candidates(df: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """Batch-score query×record candidates with the reference formulas."""
    n = len(df)
    q = {"street": df["q_street"].to_numpy(dtype=object),
         "house": df["q_house"].to_numpy(dtype=object),
         "unit": df["q_unit"].to_numpy(dtype=object),
         "city": df["q_city"].to_numpy(dtype=object),
         "state": df["q_state"].to_numpy(dtype=object),
         "zip": df["q_zip"].to_numpy(dtype=object)}
    r = {"street_name": df["STREET"].to_numpy(dtype=object),
         "street_type": df["STRTYPE"].to_numpy(dtype=object),
         "predir": df["PREDIR"].to_numpy(dtype=object),
         "house": df["HOUSE"].to_numpy(dtype=object),
         "unit": df["APTNBR"].to_numpy(dtype=object),
         "city": df["CITY"].to_numpy(dtype=object),
         "state": df["STATE"].to_numpy(dtype=object),
         "zip": df["ZIP_CODE"].to_numpy(dtype=object)}
    comp = scoring.component_scores(q, r)
    confidence = scoring.weighted_confidence(comp, cfg)
    from address_address_matching_ray.functions import fuzzy

    similarity = fuzzy.batch_ratio(df["q_norm"].tolist(), df["r_norm"].tolist())
    exact = scoring.exactness(similarity, confidence, comp)
    tier = scoring.assign_tier(confidence)
    unit_adj = scoring.unit_adjustment(q["unit"], r["unit"], cfg)
    quality = scoring.quality_score(confidence, similarity, comp, tier, r)
    quality = np.clip(quality + unit_adj, 0.0, None)
    out = df[["query_id", "query", "pid", "ADDRESS"]].copy()
    out["confidence"] = confidence
    out["similarity"] = similarity
    out["exact"] = exact
    out["tier_idx"] = tier
    out["match_level"] = scoring.TIER_NAMES_ARR[tier]
    out["unit_exact"] = unit_adj > 0
    out["wrong_unit"] = unit_adj < 0
    out["quality_score"] = quality
    out["confidence_adjusted"] = scoring.adjusted_confidence(confidence, tier)
    out["reliability"] = scoring.RELIABILITY_NAMES[scoring.reliability(quality)]
    # U:859-866 warnings (UltimateMatchResult parity); joined to one
    # semicolon-separated string so the column round-trips CSV/SQL
    out["warnings"] = scoring.warning_strings(tier, similarity)
    return out


def _empty_scored() -> pd.DataFrame:
    """Typed empty frame matching ``_score_candidates`` output —
    schema-stable empty blocks (untyped empties triggered executor
    schema warnings)."""
    return pd.DataFrame({
        "query_id": pd.array([], dtype="uint64"),
        "query": pd.Series([], dtype=object),
        "pid": pd.Series([], dtype=object),
        "ADDRESS": pd.Series([], dtype=object),
        "confidence": pd.array([], dtype="float64"),
        "similarity": pd.array([], dtype="float64"),
        "exact": pd.array([], dtype="bool"),
        "tier_idx": pd.array([], dtype="int8"),
        "match_level": pd.Series([], dtype=object),
        "unit_exact": pd.array([], dtype="bool"),
        "wrong_unit": pd.array([], dtype="bool"),
        "quality_score": pd.array([], dtype="float64"),
        "confidence_adjusted": pd.array([], dtype="float64"),
        "reliability": pd.Series([], dtype=object),
        "warnings": pd.Series([], dtype=object),
    })


def _match_core(qk, rk, cfg: PipelineConfig, buckets: int,
                candidates_per_query: int, score_fn):
    """The shared match machinery (VERDICT r4 #4: one body for every
    scorer so the oracled jaro variant checks the SAME code paths the
    rapidfuzz pipeline runs): tag → union → block-hash buckets → per-
    tier-capped cross pairs → ``score_fn`` → query-hash buckets →
    priority-sort winner.  ``score_fn`` maps a candidate frame (columns
    query_id + Q_PAYLOAD + R_PAYLOAD) to the scored schema
    (``_empty_scored`` columns)."""

    def tag(side):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("side", pa.array([side] * t.num_rows, pa.string()))
        return f

    both = qk.map_batches(tag("q"), batch_format="pyarrow").union(
        rk.map_batches(tag("r"), batch_format="pyarrow"))

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_array(df["block_key"].to_numpy(dtype=object))
        df["bucket"] = (h % np.uint64(buckets)).astype("int64")
        return df

    # per-tier retrieval caps (U:281-364): each key family is the
    # blocking analog of one tier's ES query, so its blocks keep at
    # most that tier's max_results candidates (1 exact … 50
    # desperate); candidates_per_query stays the global ceiling
    cap = max(candidates_per_query, 50)
    fam_cap = {fam: min(TIER_CAPS[tier], cap)
               for fam, tier in KEY_FAMILY_TIER.items()}

    def cross_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All query×record pairs within each block of the bucket,
        capped per (query, block) — the reference's per-tier max_results
        caps (K1/K3).  Fully vectorized: per-block cross products are
        decomposed arithmetically (pair k of block g → q = k // nr,
        r = k % nr) instead of a Python loop per block — the loop shape
        was fine for 200 queries and wrong for a 10^9-query batch.

        Candidates are sorted by pid BEFORE capping: upstream arrival
        order is not deterministic under retries/partitioning, so an
        unsorted head() could truncate a different candidate set per
        run (SURVEY §4.2 determinism invariant)."""
        empty = {"query_id": pd.array([], dtype="uint64")}
        empty.update({c: pd.Series([], dtype=object)
                      for c in (*Q_PAYLOAD, *R_PAYLOAD)})
        if not len(g):
            return pd.DataFrame(empty)
        qs = (g[g["side"] == "q"]
              .sort_values(["block_key", "query_id"], kind="mergesort")
              .drop_duplicates(["block_key", "query_id"])
              .reset_index(drop=True))
        rs = (g[g["side"] == "r"]
              .sort_values(["block_key", "pid"], kind="mergesort")
              .drop_duplicates(["block_key", "pid"])
              .reset_index(drop=True))
        if not len(qs) or not len(rs):
            return pd.DataFrame(empty)
        # per-pid-sorted rank within block → deterministic cap at the
        # block's tier max_results (reference retrieval truncation;
        # pid order stands in for ES _score order — documented delta)
        r_rank = rs.groupby("block_key", sort=False).cumcount().to_numpy()
        fams = rs["block_key"].str.split(":", n=1).str[0]
        r_caps = fams.map(fam_cap).fillna(cap).to_numpy(dtype=np.int64)
        rs = rs[r_rank < r_caps].reset_index(drop=True)
        # align blocks present on both sides
        blocks, q_code = np.unique(qs["block_key"].to_numpy(dtype=object),
                                   return_inverse=True)
        r_keys = rs["block_key"].to_numpy(dtype=object)
        pos = np.searchsorted(blocks, r_keys)
        pos_c = np.minimum(pos, len(blocks) - 1)
        r_in = blocks[pos_c] == r_keys
        r_code = pos_c[r_in]
        rs = rs[r_in].reset_index(drop=True)
        nb = len(blocks)
        nq = np.bincount(q_code, minlength=nb)
        nr = np.bincount(r_code, minlength=nb)
        q_start = np.concatenate([[0], np.cumsum(nq)[:-1]])
        r_start = np.concatenate([[0], np.cumsum(nr)[:-1]])
        counts = nq * nr
        P = int(counts.sum())
        if P == 0:
            return pd.DataFrame(empty)
        blk_of = np.repeat(np.arange(nb), counts)
        k = np.arange(P) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        nr_of = np.repeat(nr, counts)
        q_rows = q_start[blk_of] + k // np.maximum(nr_of, 1)
        r_rows = r_start[blk_of] + k % np.maximum(nr_of, 1)
        left = qs.iloc[q_rows][["query_id", *Q_PAYLOAD]].reset_index(drop=True)
        right = rs.iloc[r_rows][list(R_PAYLOAD)].reset_index(drop=True)
        out = pd.concat([left, right], axis=1)
        return out.drop_duplicates(["query_id", "pid"])

    cand = (both.map_batches(bucketize, batch_format="pandas")
            .groupby("bucket").map_groups(
                lambda g: cross_pairs(g.drop(columns=["bucket"])),
                batch_format="pandas"))

    scored = cand.map_batches(score_fn, batch_format="pandas")

    # cross-bucket dedup of (query, pid) + tier-ladder filter, then best
    # per query (K1/K2 with the unit-priority collapse).  Acceptance
    # floor = the LOWEST tier threshold (desperate, 5.0) like the
    # reference cascade (U:894-945) — ``cfg.min_similarity_threshold``
    # belongs to the linkage-edge path and must NOT truncate the ladder
    # (it made the semantic/phonetic/keyword/desperate tiers, whose
    # keys are generated specifically for degraded queries, unreachable).
    #
    # Shape: bucket by hash(query_id) % B + ONE vectorized sort /
    # drop_duplicates per bucket — ``groupby(query_id).map_groups``
    # would pay a Python call per query, the wrong shape for a
    # 10^9-query batch (all of a query's candidates share its bucket,
    # so first-row-per-query after the priority sort IS the winner).
    ladder_floor = float(scoring.TIER_THRESHOLDS[-1])

    def add_qbucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        q = df["query_id"].to_numpy(dtype="uint64")
        with np.errstate(over="ignore"):
            h = q * np.uint64(0x9E3779B97F4A7C15)
        df["_qb"] = (h % np.uint64(buckets)).astype("int64")
        return df

    def best_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_qb"]).drop_duplicates(["query_id", "pid"])
        g = g[(g["confidence"] >= ladder_floor)
              & ~g["wrong_unit"].astype(bool)]
        if not len(g):
            return g.head(0).drop(columns=["wrong_unit"])
        g = g.sort_values(
            ["query_id", "unit_exact", "exact", "confidence", "pid"],
            ascending=[True, False, False, False, True], kind="mergesort")
        return (g.drop_duplicates("query_id", keep="first")
                 .drop(columns=["wrong_unit"]).reset_index(drop=True))

    return (scored.map_batches(add_qbucket, batch_format="pandas")
            .groupby("_qb").map_groups(best_in_bucket,
                                       batch_format="pandas"))


def match_queries(queries_ds, records_ds, cfg: PipelineConfig | None = None,
                  buckets: int = 32, candidates_per_query: int = 64):
    """queries (query_id, query) × records (F2 schema) → best match per
    query.  Unmatched queries are NOT silently dropped — join the result
    back or check ``match_level == 'failed'`` rows from
    ``attach_failed``."""
    cfg = cfg or PipelineConfig()

    qk = queries_ds.map_batches(_query_keys, fn_kwargs={"cfg": cfg},
                                batch_format="pyarrow", batch_size=1024)
    rk = records_ds.map_batches(_record_keys, fn_kwargs={"cfg": cfg},
                                batch_format="pyarrow", batch_size=2048)
    return _match_core(
        qk, rk, cfg, buckets, candidates_per_query,
        lambda df: _score_candidates(df, cfg) if len(df) else _empty_scored())


# ── DuckDB-oracled jaro variant (VERDICT r4 #4) ────────────────
#
# ``match_queries_jaro`` drives the SAME ``_match_core`` machinery —
# key-family blocking, per-tier max_results caps, capped cross pairs,
# cross-bucket dedup, ladder floor, wrong-unit veto, priority-sort
# winner — with a scorer built ONLY from SQL-replayable pieces: plain
# Jaro (``fuzzy.jaro_winkler(prefix_weight=0)`` ≡ DuckDB
# ``jaro_similarity * 100.0``, the ``name_jaro`` parity surface) and
# exact-equality component scores.  The structured pseudo-addresses
# are derived from the ``part`` table with expressions DuckDB can
# mirror, so the whole cascade becomes hash-exact checkable end-to-end
# — the machinery check the free-text pipeline (whose rapidfuzz
# kernels are pytest-parity-gated instead) could never get from SQL.

_JARO_FAMS = ("e", "h", "f", "k")   # caps 1 / 3 / 10 / 35 via TIER_CAPS


def _jaro100_pairs(a, b):
    """Batched plain Jaro (0-100) over object arrays via
    apply_unique_pairs — the shared kernel of every *_jaro oracle
    surface."""
    from address_address_matching_ray.functions import fuzzy

    return fuzzy.apply_unique_pairs(
        lambda As, Bs: np.array(
            [fuzzy.jaro_winkler(x, y, prefix_weight=0.0)
             for x, y in zip(As, Bs)], dtype="float64"),
        a, b)


def _jaro_confidence(street_l, street_r, house_l, house_r, city_l, city_r,
                     zip_l, zip_r, state_l, state_r, unit_l, unit_r):
    """The ONE pinned confidence expression every *_jaro oracle twin
    and its SQL mirror share: plain-Jaro street/city comps,
    exact-equality house/zip/state/unit comps, left-associated
    weighted sum (literal order mirrored in the SQL), wrong-unit
    flag.  Returns (comps dict, confidence, wrong_unit)."""
    js = _jaro100_pairs(street_l, street_r)
    jc = _jaro100_pairs(city_l, city_r)
    jh = np.where(house_l == house_r, 100.0, 0.0)
    jz = np.where(zip_l == zip_r, 100.0, 0.0)
    jst = np.where(state_l == state_r, 100.0, 0.0)
    ju = np.where((unit_l != "") & (unit_r != "") & (unit_l == unit_r),
                  100.0, 0.0)
    conf = (0.40 * js + 0.25 * jh + 0.15 * jc + 0.10 * jz
            + 0.05 * jst + 0.05 * ju)
    wrong_unit = (unit_l != "") & (unit_r != "") & (unit_l != unit_r)
    comps = {"street": js, "house": jh, "city": jc, "zip": jz,
             "state": jst, "unit": ju}
    return comps, conf, wrong_unit


def _jaro_struct(df: pd.DataFrame, queries: bool) -> pd.DataFrame:
    """Structured pseudo-address fields from part rows; every
    expression here is mirrored verbatim in the oracle SQL.  Queries
    are the ``p_partkey % 4 == 1`` subset with the street's last token
    dropped (so Jaro has real work) and a different unit-absence
    modulus (so bonus/penalty/veto all occur)."""
    ck = df["p_partkey"].to_numpy(np.int64)
    nk = df["p_size"].to_numpy(np.int64) % 25
    street = pd.Series(normalize_array(
        (df["p_name"].fillna("") + " " + df["p_type"].fillna(""))
        .to_numpy(dtype=object)), dtype=object)
    if queries:
        street = street.str.replace(r"\s\S+$", "", regex=True)
    house = pd.Series((ck % 90 + 10).astype(str), dtype=object)
    city = pd.Series("city" + pd.Series(nk.astype(str)), dtype=object)
    state = pd.Series((nk % 10).astype(str), dtype=object)
    zipc = pd.Series((10 + nk).astype(str), dtype=object)
    unit_mod = 5 if queries else 3
    unit = pd.Series(np.where(ck % unit_mod == 0, "",
                              (ck % 7).astype(str)), dtype=object)
    norm = ((house + " " + street + " " + city + " " + state + " " + zipc)
            .str.replace(r"\s+", " ", regex=True).str.strip())
    return pd.DataFrame({
        "ck": ck, "street": street, "house": house, "city": city,
        "state": state, "zip": zipc, "unit": unit, "norm": norm})


def _jaro_keys(f: pd.DataFrame) -> pd.DataFrame:
    """The four block-key families (shared expressions both sides):
    e: zip|house · h: state|house · f: zip · k: state."""
    return pd.concat([
        f.assign(block_key="e:" + f["zip"] + "|" + f["house"]),
        f.assign(block_key="h:" + f["state"] + "|" + f["house"]),
        f.assign(block_key="f:" + f["zip"]),
        f.assign(block_key="k:" + f["state"]),
    ], ignore_index=True)


def _jaro_query_keys(df: pd.DataFrame) -> pd.DataFrame:
    df = df[df["p_partkey"] % 4 == 1]
    f = _jaro_struct(df, queries=True)
    k = _jaro_keys(f)
    return pd.DataFrame({
        "query_id": k["ck"].to_numpy().astype("uint64"),
        "q_street": k["street"], "q_house": k["house"],
        "q_unit": k["unit"], "q_city": k["city"], "q_state": k["state"],
        "q_zip": k["zip"], "q_norm": k["norm"], "query": k["norm"],
        "block_key": k["block_key"]})


def _jaro_record_keys(df: pd.DataFrame) -> pd.DataFrame:
    f = _jaro_struct(df, queries=False)
    k = _jaro_keys(f)
    return pd.DataFrame({
        "pid": k["ck"].astype(str).astype(object),
        "ADDRESS": k["norm"], "HOUSE": k["house"], "STREET": k["street"],
        "STRTYPE": "", "PREDIR": "", "CITY": k["city"],
        "STATE": k["state"], "ZIP_CODE": k["zip"], "APTNBR": k["unit"],
        "r_norm": k["norm"], "block_key": k["block_key"]})


def _score_candidates_jaro(df: pd.DataFrame,
                           cfg: PipelineConfig) -> pd.DataFrame:
    """SQL-replayable scorer: component scores are plain Jaro
    (street/city/full) or exact equality (house/zip/state/unit), the
    confidence is ONE pinned left-associated weighted sum (same literal
    order as the oracle), tiers/exactness/unit adjustment are the real
    ``scoring`` helpers — all bit-reproducible in DuckDB."""
    qu = df["q_unit"].to_numpy(dtype=object)
    ru = df["APTNBR"].to_numpy(dtype=object)
    comp, confidence, _wrong = _jaro_confidence(
        df["q_street"].to_numpy(dtype=object),
        df["STREET"].to_numpy(dtype=object),
        df["q_house"].to_numpy(dtype=object),
        df["HOUSE"].to_numpy(dtype=object),
        df["q_city"].to_numpy(dtype=object),
        df["CITY"].to_numpy(dtype=object),
        df["q_zip"].to_numpy(dtype=object),
        df["ZIP_CODE"].to_numpy(dtype=object),
        df["q_state"].to_numpy(dtype=object),
        df["STATE"].to_numpy(dtype=object),
        qu, ru)
    similarity = _jaro100_pairs(df["q_norm"].to_numpy(dtype=object),
                                df["r_norm"].to_numpy(dtype=object))
    exact = scoring.exactness(similarity, confidence, comp)
    tier = scoring.assign_tier(confidence)
    unit_adj = scoring.unit_adjustment(qu, ru, cfg)
    out = df[["query_id", "query", "pid", "ADDRESS"]].copy()
    out["confidence"] = confidence
    out["similarity"] = similarity
    out["exact"] = exact
    out["tier_idx"] = tier
    out["match_level"] = scoring.TIER_NAMES_ARR[tier]
    out["unit_exact"] = unit_adj > 0
    out["wrong_unit"] = unit_adj < 0
    # quality formulas belong to the main scorer (parity-gated there);
    # this surface reports confidence-derived stand-ins so the frame
    # matches the shared scored schema
    out["quality_score"] = confidence
    out["confidence_adjusted"] = scoring.adjusted_confidence(
        confidence, tier)
    out["reliability"] = scoring.RELIABILITY_NAMES[
        scoring.reliability(confidence)]
    out["warnings"] = scoring.warning_strings(tier, similarity)
    return out


def match_queries_jaro(parts_ds, cfg: PipelineConfig | None = None,
                       buckets: int = 32,
                       candidates_per_query: int = 64):
    """part-table pseudo-addresses through the full match cascade
    with the Jaro-only scorer — returns the same best-per-query shape
    as ``match_queries``, hash-checkable against the DuckDB oracle."""
    cfg = cfg or PipelineConfig()
    qk = parts_ds.map_batches(_jaro_query_keys, batch_format="pandas")
    rk = parts_ds.map_batches(_jaro_record_keys, batch_format="pandas")
    return _match_core(
        qk, rk, cfg, buckets, candidates_per_query,
        lambda df: (_score_candidates_jaro(df, cfg) if len(df)
                    else _empty_scored()))


def attach_failed(queries_ds, matches_ds,
                  broadcast_threshold: int = 5_000_000):
    """Left-attach: queries with no surviving candidate get a 'failed'
    row (U:950-952) instead of disappearing.  The matched-id semi-join
    uses the scale-safe ``filter_out_ids`` (sorted-array broadcast /
    hash anti-join), never a Python set — the matched set is O(queries)."""
    from address_address_matching_ray.stages.cluster import filter_out_ids

    unmatched = filter_out_ids(
        queries_ds, matches_ds.select_columns(["query_id"]),
        id_col="query_id", broadcast_threshold=broadcast_threshold)

    def failed_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame({
            "query_id": df["query_id"].to_numpy(dtype="uint64"),
            "query": df["query"].to_numpy(dtype=object),
            "pid": pd.Series([None] * n, dtype=object),
            "ADDRESS": pd.Series([None] * n, dtype=object),
            "confidence": np.zeros(n), "similarity": np.zeros(n),
            "exact": np.zeros(n, dtype=bool),
            "tier_idx": np.full(n, 10, dtype="int8"),
            "match_level": pd.Series(["failed"] * n, dtype=object),
            "unit_exact": np.zeros(n, dtype=bool),
            "quality_score": np.zeros(n),
            "confidence_adjusted": np.zeros(n),
            "reliability": pd.Series(["speculative"] * n, dtype=object),
            "warnings": pd.Series(["No matches found"] * n, dtype=object),
        })

    return matches_ds.union(
        unmatched.map_batches(failed_rows, batch_format="pandas"))


def to_n8n_format(matches_ds):
    """U:128-135 — the downstream workflow projection."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "query_id": df["query_id"],
            "success": df["pid"].notna(),
            "address_id": df["pid"],
            "confidence": df["confidence_adjusted"],
            "reliability": df["reliability"],
        })

    return matches_ds.map_batches(f, batch_format="pandas")
