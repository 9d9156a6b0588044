"""Query→records matching — the reference's primary API.

The round-trip test IS the reference's only correctness oracle
(``test_title_data_matching_100_samples``, U:1656-1762): matching each
record's own ADDRESS string must resolve back to that record's pid.
"""

import pandas as pd
import pytest

from address_address_matching_ray.config import PipelineConfig
from address_address_matching_ray.sources.records import (
    FIXTURE_RECORDS, fixture_records_table, synth_records,
)


def _queries_ds(ray_session, strings):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "query_id": pa.array(range(len(strings)), pa.uint64()),
        "query": pa.array(strings, pa.string())}))


@pytest.fixture(scope="module")
def records_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(fixture_records_table()).union(
        synth_records(300, seed=42)).materialize()


def test_roundtrip_self_match(ray_session, records_ds):
    """U:1656 analog: every fixture record's ADDRESS resolves to its own
    pid with a reliable level."""
    from address_address_matching_ray.pipelines.matching import match_queries

    queries = [r["ADDRESS"] for r in FIXTURE_RECORDS]
    out = match_queries(_queries_ds(ray_session, queries), records_ds,
                        buckets=4).to_pandas()
    out = out.sort_values("query_id")
    assert len(out) == len(queries)
    got = out.pid.tolist()
    want = [r["pid"] for r in FIXTURE_RECORDS]
    assert got == want, list(zip(queries, got, want))
    assert (out.confidence >= 85).all()


def test_canonical_tricky_queries(ray_session, records_ds):
    """The five tricky parse cases (U:1772-1778) as raw query strings —
    unit-first forms must land on the right record."""
    from address_address_matching_ray.pipelines.matching import match_queries

    cases = {
        "85-101 North 3rd Street Brooklyn, NY 11249": "test_001",
        "3R 112 Bedford Avenue Brooklyn, NY 11211": "test_002",
        "1H 55 Berry Street Brooklyn, NY 11211": "test_003",
        "21F 22 NORTH 6 STREET Brooklyn, NY 11249": "test_004",
        "3Q 60 Broadway Brooklyn, NY 11249": "test_005",
    }
    out = match_queries(_queries_ds(ray_session, list(cases)), records_ds,
                        buckets=4).to_pandas().sort_values("query_id")
    assert out.pid.tolist() == list(cases.values()), out[["query", "pid", "confidence"]]


def test_failed_and_n8n(ray_session, records_ds):
    from address_address_matching_ray.pipelines.matching import (
        attach_failed, match_queries, to_n8n_format,
    )

    qs = _queries_ds(ray_session, [
        "55 Berry Street Apt 1H Brooklyn NY 11211",
        "9999 Nonexistent Plaza Nowhere ZZ 00000",
        "",
    ])
    matches = match_queries(qs, records_ds, buckets=4).materialize()
    full = attach_failed(qs, matches).to_pandas().sort_values("query_id")
    assert len(full) == 3
    assert full.match_level.tolist()[0] != "failed"
    assert full.match_level.tolist()[1] == "failed"
    assert full.match_level.tolist()[2] == "failed"

    n8n = to_n8n_format(matches).to_pandas()
    assert set(n8n.columns) == {"query_id", "success", "address_id",
                                "confidence", "reliability"}
    assert n8n.success.all()


def test_unit_priority(ray_session):
    """A unit-bearing query prefers the unit-exact record over a same-
    address record without unit (U:911-943 collapse)."""
    import pyarrow as pa
    import ray.data as rd
    from address_address_matching_ray.pipelines.matching import match_queries

    recs = rd.from_arrow(pa.table({
        "pid": ["no_unit", "right_unit", "wrong_unit"],
        "ADDRESS": ["77 Kent Avenue Brooklyn, NY 11249",
                    "77 Kent Avenue Apt 4B Brooklyn, NY 11249",
                    "77 Kent Avenue Apt 9Z Brooklyn, NY 11249"],
        "HOUSE": ["77", "77", "77"], "STREET": ["Kent", "Kent", "Kent"],
        "STRTYPE": ["Ave", "Ave", "Ave"], "PREDIR": ["", "", ""],
        "CITY": ["Brooklyn"] * 3, "STATE": ["NY"] * 3,
        "ZIP_CODE": ["11249"] * 3, "APTNBR": ["", "4B", "9Z"]}))
    out = match_queries(
        _queries_ds(ray_session, ["77 Kent Avenue Apt 4B Brooklyn NY 11249"]),
        recs, buckets=2).to_pandas()
    assert out.pid.tolist() == ["right_unit"]
    assert bool(out.unit_exact.iloc[0])


def test_degraded_query_keyword_tier(ray_session, records_ds):
    """A query with no house number still retrieves via keyword keys
    (the reference's semantic/phonetic/keyword tiers, U:894-905)."""
    from address_address_matching_ray.pipelines.matching import match_queries

    out = match_queries(
        _queries_ds(ray_session, ["Berry Street Brooklyn, NY 11211"]),
        records_ds, buckets=4).to_pandas()
    assert len(out) == 1
    assert out.pid.iloc[0] is not None
    # street matches a Berry record; confidence reflects the formulas
    assert "Berry" in out.ADDRESS.iloc[0]


def test_match_queries_partition_invariance(ray_session, records_ds):
    """Best-match output must be byte-identical across bucket counts
    (regression: unsorted candidate capping truncated a different set
    depending on block arrival order)."""
    from address_address_matching_ray.pipelines.matching import match_queries

    qs = _queries_ds(ray_session, [
        "112 Bedford Avenue Brooklyn, NY 11211",
        "55 Berry St Brooklyn NY 11211",
        "Berry Street Brooklyn, NY 11211",
        "22 NORTH 6 STREET #21F Brooklyn NY 11249",
        "9999 Nonexistent Plaza Nowhere ZZ 00000",
    ])
    frames = []
    for buckets in (2, 7):
        df = (match_queries(qs, records_ds, buckets=buckets).to_pandas()
              .sort_values("query_id").reset_index(drop=True))
        frames.append(df)
    pd.testing.assert_frame_equal(frames[0], frames[1])
    assert "warnings" in frames[0].columns


def test_low_tier_match_carries_warnings(ray_session, records_ds):
    """A degraded query that lands in the phonetic/keyword/desperate
    tiers carries the U:859-866 warning flags."""
    import numpy as np
    from address_address_matching_ray.functions import scoring

    tier = np.array([8], dtype=np.int8)
    sim = np.array([30.0])
    w = scoring.warning_strings(tier, sim)
    assert "Low confidence match level" in w[0]
    assert "Low similarity score" in w[0]


def test_per_tier_max_results_caps(ray_session):
    """Tier-k retrieval truncation (U:281-364): each key family keeps
    at most its tier's max_results candidates per block, pid-ordered
    (the deterministic stand-in for ES _score order).  Replays the
    reference setup: a block stuffed past every shared family's cap
    makes a late-pid perfect match unreachable — exactly what the
    reference's per-tier `size` does — while lifting the caps restores
    it."""
    import pyarrow as pa
    import ray.data as rd

    from address_address_matching_ray.config import TIER_CAPS
    from address_address_matching_ray.pipelines.matching import match_queries

    # 32 fillers + one exact-unit record sorting LAST by pid.  All 33
    # share the h:/h2:/f:/s: blocks (same HOUSE|STREET|ZIP|STATE); only
    # z_best carries the query's unit (unit_exact is the top-priority
    # sort key, U:938-939).  Caps: relaxed 3, partial 5, geographic 10,
    # phonetic 30 → z_best (pid rank 32) is never retrieved.  ADDRESS
    # strings are kept distinct from the query so no record co-blocks
    # via the exact family.
    fillers = [{"pid": f"a{i:02d}", "ADDRESS": f"100 Main St #{i}",
                "HOUSE": "100", "STREET": "Main", "STRTYPE": "St",
                "PREDIR": "", "CITY": "Springfield", "STATE": "IL",
                "ZIP_CODE": "62701", "APTNBR": ""} for i in range(32)]
    best = {"pid": "z_best", "ADDRESS": "100 Main St Apt 7",
            "HOUSE": "100", "STREET": "Main", "STRTYPE": "St",
            "PREDIR": "", "CITY": "Springfield", "STATE": "IL",
            "ZIP_CODE": "62701", "APTNBR": "7"}
    records = rd.from_arrow(pa.Table.from_pylist(fillers + [best]))
    queries = rd.from_arrow(pa.table({
        "query_id": pa.array([0], pa.uint64()),
        "query": ["100 Main St Apt 7 Springfield IL 62701"]}))

    capped = match_queries(queries, records, buckets=4).to_pandas()
    assert len(capped) == 1
    assert capped.iloc[0]["pid"] != "z_best"      # truncated away

    # lifting the per-tier caps (the reference would set max_results
    # high) makes the late-pid perfect match retrievable again
    saved = dict(TIER_CAPS)
    try:
        for k in TIER_CAPS:
            TIER_CAPS[k] = 64
        uncapped = match_queries(queries, records, buckets=4).to_pandas()
    finally:
        TIER_CAPS.update(saved)
    assert uncapped.iloc[0]["pid"] == "z_best"
    assert bool(uncapped.iloc[0]["unit_exact"])
    assert not bool(capped.iloc[0]["unit_exact"])
