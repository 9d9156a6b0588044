"""Generate the F3 labeled-pairs golden artifact (FIXTURES.md).

Deterministic: 800-page synthetic fixture → pipeline blocking →
candidate pairs sharing ≥1 key; ``label`` from planted truth clusters,
``expected_tier``/``expected_accept`` from replaying the reference
formulas (the scalar oracle in tests/test_scoring.py).

Run:  python tests/make_labeled_pairs.py   (writes tests/golden/labeled_pairs.parquet)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

N_PAGES = 800
OUT = os.path.join(os.path.dirname(__file__), "golden", "labeled_pairs.parquet")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from address_address_matching_ray.config import TIER_TABLE, PipelineConfig
    from address_address_matching_ray.sources.synth import synth_pages, synth_truth
    from address_address_matching_ray.stages.extract import extract_stage
    from address_address_matching_ray.stages.keys import keys_stage
    from address_address_matching_ray.stages.pairs import pairs_stage
    from tests.test_scoring import (
        oracle_component_scores, oracle_confidence, oracle_tier,
    )

    cfg = PipelineConfig()
    ext = extract_stage(synth_pages(N_PAGES, seed=42)).materialize()
    pairs = pairs_stage(keys_stage(ext, cfg), cfg, buckets=8).to_pandas()
    truth = synth_truth(N_PAGES, seed=42).to_pandas().set_index("doc_id").cluster_id

    tier_names = [t[0] for t in TIER_TABLE] + ["failed"]
    rows = []
    for _, e in pairs.iterrows():
        q = {"street": " ".join(p for p in (e.l_street_name, e.l_street_type) if p),
             "house": e.l_house, "unit": e.l_unit, "city": e.l_city,
             "state": e.l_state, "zip": e.l_zip}
        r = {"street_name": e.r_street_name, "street_type": e.r_street_type,
             "predir": "", "house": e.r_house, "unit": e.r_unit,
             "city": e.r_city, "state": e.r_state, "zip": e.r_zip}
        conf = oracle_confidence(oracle_component_scores(q, r))
        tier = tier_names[oracle_tier(conf)]
        accept = (conf >= cfg.edge_min_confidence and tier != "failed")
        if e.l_unit and e.r_unit and e.l_unit.upper() != e.r_unit.upper():
            accept = False
        rows.append((int(e.left_id), int(e.right_id),
                     bool(truth.loc[e.left_id] == truth.loc[e.right_id]),
                     e.block_key, tier, accept, round(conf, 6)))

    out = pd.DataFrame(rows, columns=[
        "left_id", "right_id", "label", "block_key", "expected_tier",
        "expected_accept", "expected_confidence"])
    out["left_id"] = out["left_id"].astype("uint64")
    out["right_id"] = out["right_id"].astype("uint64")
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), OUT)
    print(f"wrote {len(out)} labeled pairs → {OUT}")
    print(out.expected_tier.value_counts().to_string())
    ray.shutdown()


if __name__ == "__main__":
    main()
