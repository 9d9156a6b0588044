"""The F3 labeled-pairs gate (FIXTURES.md): the pipeline's per-pair
decisions must reproduce the replayed reference-formula decisions
(F1 ≥ 0.99 — measured exact) and the planted truth labels (F1 ≥ 0.99)
on the frozen candidate-pair corpus sharing blocking keys."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

ARTIFACT = os.path.join(os.path.dirname(__file__), "golden", "labeled_pairs.parquet")
N_PAGES = 800


@pytest.fixture(scope="module")
def labeled():
    return pq.read_table(ARTIFACT).to_pandas()


def test_artifact_shape(labeled):
    assert len(labeled) > 5000
    assert (labeled.left_id < labeled.right_id).all()
    assert set(labeled.columns) >= {"left_id", "right_id", "label",
                                    "block_key", "expected_tier",
                                    "expected_accept"}


def test_pipeline_decisions_match_artifact(ray_session):
    from address_address_matching_ray.pipelines.linkage import run_linkage
    from address_address_matching_ray.sources.synth import synth_pages

    labeled = pq.read_table(ARTIFACT).to_pandas()
    res = run_linkage(synth_pages(N_PAGES, seed=42), buckets=8,
                      num_partitions=4)
    edges = res.edges.to_pandas().drop_duplicates(["left_id", "right_id"])
    m = labeled.merge(edges, on=["left_id", "right_id"], how="left")
    # every artifact pair was a pipeline candidate pair
    assert m.accepted.notna().all()
    got = m.accepted.fillna(False).astype(bool)
    want = m.expected_accept.astype(bool)
    tp = (got & want).sum()
    prec = tp / got.sum() if got.sum() else 1.0
    rec = tp / want.sum() if want.sum() else 1.0
    f1 = 2 * prec * rec / (prec + rec)
    assert f1 >= 0.99, f"decision F1 {f1:.4f}"
    # tier parity on the scored pairs
    tier_match = (m.tier == m.expected_tier).mean()
    assert tier_match >= 0.99, f"tier parity {tier_match:.4f}"
    assert np.allclose(m.confidence, m.expected_confidence, atol=1e-4)

    # cluster-level pairwise F1 vs planted truth labels
    clusters = res.clusters.to_pandas().set_index("doc_id").cluster_id
    same = (clusters.loc[m.left_id].to_numpy()
            == clusters.loc[m.right_id].to_numpy())
    lbl = m.label.astype(bool).to_numpy()
    tp2 = (same & lbl).sum()
    prec2 = tp2 / same.sum() if same.sum() else 1.0
    rec2 = tp2 / lbl.sum() if lbl.sum() else 1.0
    f1_truth = 2 * prec2 * rec2 / (prec2 + rec2)
    assert f1_truth >= 0.99, f"truth F1 {f1_truth:.4f}"
