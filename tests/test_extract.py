"""Extraction stage: golden byte-identity invariant + determinism."""

import os

import numpy as np
import pytest

from address_address_matching_ray.sources.synth import pages_batch, truth_batch
from address_address_matching_ray.stages.extract import (
    extract_address, extract_parse, extract_text,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "extracted_text")


def test_extract_text_basics():
    html = (b"<html><head><script>var x=1;</script><style>.a{}</style></head>"
            b"<body><!-- c --><p>Hello &amp; world</p><div>2nd  line</div></body></html>")
    assert extract_text(html) == "Hello & world 2nd line"
    assert extract_text(b"") == ""
    assert extract_text(None) == ""
    assert extract_text("plain text") == "plain text"
    # unclosed script eats to end deterministically? (no closing tag → kept as tag-stripped)
    assert "alert" not in extract_text(b"<script>alert(1)</script>ok")


def test_extract_text_golden_byte_identity():
    """The per-url byte-identity invariant (BASELINE.json input_hint):
    extraction output is frozen by golden files."""
    t = pages_batch(np.arange(0, 40), seed=42)
    ids = t["doc_id"].to_pylist()
    htmls = t["html"].to_pylist()
    for i, h in zip(ids, htmls):
        got = extract_text(h)
        with open(os.path.join(GOLDEN_DIR, f"{i}.txt")) as f:
            want = f.read()
        assert got == want, f"extraction drifted for doc {i}"
        assert extract_text(h) == got  # idempotent / deterministic


def test_extract_address():
    assert extract_address(
        "For rent: 55 Berry Street Brooklyn, NY 11211. Sunny.") == \
        "55 Berry Street Brooklyn, NY 11211."[:-1]
    assert extract_address("call me maybe") == ""
    # zip-less fallback via street type
    assert "112 Bedford Avenue" in extract_address("At 112 Bedford Avenue now")
    # unit-first survives the leading-token trim
    got = extract_address("Listing 3R 112 Bedford Avenue Brooklyn NY 11211 nice")
    assert got.startswith("3R 112 Bedford")


def test_extract_parse_batch():
    t = pages_batch(np.arange(0, 200), seed=42)
    out = extract_parse(t)
    assert out.num_rows == 200
    assert out["doc_id"].to_pylist() == t["doc_id"].to_pylist()
    addrs = out["addr"].to_pylist()
    assert sum(1 for a in addrs if a) >= 195      # near-total address recall
    houses = out["house"].to_pylist()
    zips = out["zip"].to_pylist()
    assert any(houses) and any(zips)
    # derives doc_id from url when absent (hot-cluster rows share urls
    # by construction, so distinctness is checked off the hot span)
    t2 = pages_batch(np.arange(400, 600), seed=42).drop_columns(["doc_id"])
    out2 = extract_parse(t2)
    assert len(set(out2["doc_id"].to_pylist())) > 150


def test_truth_batch_shape():
    tr = truth_batch(np.arange(0, 100))
    assert tr.num_rows == 100
    assert tr["cluster_id"].to_pylist()[:5] == [0] * 5  # hot cluster 0


def test_extract_text_series_matches_scalar():
    from address_address_matching_ray.stages.extract import extract_text_series

    t = pages_batch(np.arange(100, 160), seed=42)
    raws = t["html"].to_pylist() + [None, b"", "plain", b"<p>a &amp; b</p>"]
    assert extract_text_series(raws) == [extract_text(r) for r in raws]
