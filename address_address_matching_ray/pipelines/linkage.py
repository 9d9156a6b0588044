"""The flagship record-linkage pipeline (SURVEY §3.4 / §7.1).

    pages ─► extract/normalize/parse (stateless map_batches)
          ─► blocking keys (actor pool: MinHash perms)      [shuffle-free]
          ─► bucketed groupby → candidate pairs (capped, salted-by-window,
             canonicalized, deduped)                        [shuffles 1-2]
          ─► tiered scorer actor pool → edges               [shuffle-free]
          ─► iterative min-label propagation → clusters     [shuffles 3..k]
          ─► metrics aggregates (tier distribution, A1-A4)

Every wide step goes through hash partitioning; per-stage checkpoints
+ lineage make re-runs resumable (state/checkpoint.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from address_address_matching_ray.config import PipelineConfig
from address_address_matching_ray.stages.cluster import (
    attach_singletons, connected_components,
)
from address_address_matching_ray.stages.extract import extract_stage
from address_address_matching_ray.stages.keys import keys_stage
from address_address_matching_ray.stages.pairs import pairs_stage
from address_address_matching_ray.stages.score import score_stage


@dataclass
class LinkageResult:
    extracted: object
    edges: object
    clusters: object
    from_checkpoint: dict


def run_linkage(pages_ds, cfg: PipelineConfig | None = None,
                checkpoint_root: str | None = None,
                input_fp: str = "", buckets: int = 64,
                num_partitions: int = 16,
                cc_driver_threshold: int = 20_000_000):
    """pages Dataset → (extracted, edges, clusters) Datasets.

    With ``checkpoint_root`` set, ``extracted``/``edges``/``clusters``
    are checkpointed with lineage and reused on re-runs.
    """
    cfg = cfg or PipelineConfig()
    hit = {}

    def build_extracted():
        return extract_stage(pages_ds)

    def build_edges(extracted):
        keys = keys_stage(extracted, cfg)
        pairs = pairs_stage(keys, cfg, buckets=buckets)
        return score_stage(pairs, cfg)

    def build_clusters(extracted, edges):
        accepted = edges.filter(expr="accepted == True")
        labels = connected_components(accepted, num_partitions=num_partitions,
                                      driver_threshold=cc_driver_threshold)
        return attach_singletons(extracted, labels, num_partitions=num_partitions)

    if checkpoint_root:
        from address_address_matching_ray.state.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint_root, input_fp, cfg.fingerprint())
        extracted, hit["extracted"] = mgr.load_or_compute("extracted", build_extracted)
        edges, hit["edges"] = mgr.load_or_compute(
            "edges", lambda: build_edges(extracted))
        clusters, hit["clusters"] = mgr.load_or_compute(
            "clusters", lambda: build_clusters(extracted, edges))
    else:
        # No checkpoint dir: pin the reused intermediates in the object
        # store instead.  ``connected_components`` consumes ``edges``
        # from two branches and iterates — leaving them lazy would
        # re-execute the whole upstream lineage per branch per
        # iteration.  ``extracted`` has already dropped ``html``, so
        # both are slim relative to the input.
        extracted = build_extracted().materialize()
        edges = build_edges(extracted).materialize()
        clusters = build_clusters(extracted, edges)

    return LinkageResult(extracted=extracted, edges=edges, clusters=clusters,
                         from_checkpoint=hit)


def tier_distribution(edges_ds):
    """A2 analog: per-tier accepted-edge counts (U:1583-1598)."""
    return (edges_ds.groupby("tier").count()
            .rename_columns({"count()": "n_edges"}))


def edge_stats(edges_ds):
    """A1 analog: global counters/means over scored pairs
    (optimized.py:869-900) — one small aggregate, no driver loop."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    return edges_ds.aggregate(
        Count(),
        Sum("accepted", alias_name="n_accepted"),
        Mean("confidence", alias_name="mean_confidence"),
        Mean("similarity", alias_name="mean_similarity"),
        Max("quality", alias_name="max_quality"),
        Min("confidence", alias_name="min_confidence"),
    )
