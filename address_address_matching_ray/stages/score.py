"""Tiered pair-scoring stage: an actor pool of compiled scorers.

``pairs.map_batches(PairScorer, concurrency=N, batch_size=B)`` —
SURVEY §7.1 step 4.  The actor holds the config + warm numpy state
(SURVEY §2.3 ST3/ST5 analog); ``__call__`` decides a whole Arrow batch
of pairs with the vectorized formulas in ``functions.scoring``
(constants from optimized.py:115-131, 617-737; U:760-945).

Tier-0 short-circuit: pairs whose normalized full addresses are
byte-equal skip the fuzzy kernels entirely (exact hash path, north-star
tier ladder).

Output (``edges`` schema, SURVEY §7.0): left_id, right_id, tier,
confidence, adjusted_confidence, similarity, exact, quality,
reliability, unit_adjustment, specificity, accepted, cs_* component
scores, block_key, key_kind, dropped_pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from address_address_matching_ray.config import PipelineConfig
from address_address_matching_ray.functions import fuzzy, scoring


class PairScorer:
    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        get = lambda c: batch[c].to_pandas().fillna("").to_numpy(dtype=object)

        # "name type" joined over the nonempty parts, vectorized (the
        # r4 VERDICT item: this ran at interpreter rate per pair)
        sn, st = get("l_street_name"), get("l_street_type")
        both = (pd.Series(sn, dtype=object) + " "
                + pd.Series(st, dtype=object)).to_numpy(dtype=object)
        street = np.where(sn != "", np.where(st != "", both, sn), st)

        q = {"street": street.astype(object),
             "house": get("l_house"), "unit": get("l_unit"),
             "city": get("l_city"), "state": get("l_state"), "zip": get("l_zip")}
        r = {"street_name": get("r_street_name"), "street_type": get("r_street_type"),
             "predir": np.full(n, "", dtype=object),
             "house": get("r_house"), "unit": get("r_unit"),
             "city": get("r_city"), "state": get("r_state"), "zip": get("r_zip")}

        comp = scoring.component_scores(q, r)
        confidence = scoring.weighted_confidence(comp, cfg)

        # similarity on pre-normalized full addresses; equality fast path
        l_na, r_na = get("l_norm_addr"), get("r_norm_addr")
        eq = np.asarray(l_na == r_na, dtype=bool)
        similarity = np.full(n, 100.0)
        nz = np.nonzero(~eq)[0]
        if len(nz):
            similarity[nz] = fuzzy.apply_unique_pairs(
                fuzzy.batch_ratio, l_na[nz], r_na[nz])

        exact = scoring.exactness(similarity, confidence, comp)
        tier = scoring.assign_tier(confidence)
        unit_adj = scoring.unit_adjustment(q["unit"], r["unit"], cfg)
        spec = batch["specificity"].to_numpy(zero_copy_only=False)
        quality = scoring.quality_score(confidence, similarity, comp, tier, r,
                                        block_specificity=spec)
        quality = np.clip(quality + unit_adj, 0.0, None)   # U:920-921
        adj_conf = scoring.adjusted_confidence(confidence, tier)
        rel = scoring.reliability(quality)

        accepted = (confidence >= cfg.edge_min_confidence) & (tier < len(scoring.TIER_THRESHOLDS))
        # wrong-unit veto: same address but different explicit unit is a
        # different dwelling — the reference keeps searching past such
        # candidates at exact/relaxed (U:941-943)
        accepted &= ~(unit_adj < 0)

        out = {
            "left_id": batch["left_id"], "right_id": batch["right_id"],
            "tier": pa.array(scoring.TIER_NAMES_ARR[tier].tolist(), pa.string()),
            "tier_idx": pa.array(tier, pa.int8()),
            "confidence": pa.array(confidence, pa.float64()),
            "adjusted_confidence": pa.array(adj_conf, pa.float64()),
            "similarity": pa.array(similarity, pa.float64()),
            "exact": pa.array(exact, pa.bool_()),
            "quality": pa.array(quality, pa.float64()),
            "reliability": pa.array(
                scoring.RELIABILITY_NAMES[rel].tolist(), pa.string()),
            "unit_adjustment": pa.array(unit_adj, pa.float64()),
            "specificity": batch["specificity"],
            "accepted": pa.array(accepted, pa.bool_()),
            # U:859-866 warnings (UltimateMatchResult parity)
            "warnings": pa.array(
                scoring.warning_strings(tier, similarity, spec), pa.string()),
            "block_key": batch["block_key"], "key_kind": batch["key_kind"],
            "dropped_pairs": batch["dropped_pairs"],
        }
        for k in scoring.COMPONENT_KEYS:
            out[f"cs_{k}"] = pa.array(comp[k], pa.float64())
        return pa.table(out)


# per-worker-process scorer cache (see keys_stage: warm task pool beats
# per-stage actor spawn for cheap state; actor pool stays available for
# heavy-state scoring, e.g. model-based)
_SCORER_CACHE: dict[str, PairScorer] = {}


def _score_task(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    fp = cfg.fingerprint()
    scorer = _SCORER_CACHE.get(fp)
    if scorer is None:
        scorer = PairScorer(cfg)
        _SCORER_CACHE[fp] = scorer
    return scorer(batch)


def score_stage(pairs_ds, cfg: PipelineConfig | None = None,
                concurrency: int | tuple | None = None,
                batch_size: int | None = None,
                use_actor_pool: bool = False):
    cfg = cfg or PipelineConfig()
    if use_actor_pool:
        return pairs_ds.map_batches(
            PairScorer, fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=batch_size or cfg.score_batch_size,
            # autoscaling (min 1) so the pool never deadlocks the
            # pipeline's other stages on low-CPU machines
            concurrency=concurrency or (1, 64))
    return pairs_ds.map_batches(
        _score_task, fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=batch_size or cfg.score_batch_size)
