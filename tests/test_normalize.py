"""Normalization kernels vs the reference spec (optimized.py:235-314)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from address_address_matching_ray.functions import normalize as nz


CASES = [
    ("123 Main Street", "123 main st"),
    ("85-101 North 3rd Street Brooklyn, NY 11249", "85-101 n 3 st brooklyn ny 11249"),
    ("92nd Avenue", "92 ave"),
    ("  Multiple   Spaces  ", "multiple spaces"),
    ("North-East Boulevard!", "n-e blvd"),
    ("Café Street", "cafe st"),
    ("NORTHEAST Drive", "ne dr"),
    ("1st Ave & 2nd St", "1 ave 2 st"),
    ("", ""),
    ("Apt #4B / Unit 9", "apt #4b / unit 9"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_scalar(raw, expected):
    assert nz.normalize(raw) == expected


def test_normalize_series_matches_scalar():
    raws = [c[0] for c in CASES] + [
        "55 Berry Street Brooklyn NY", "3R 112 Bedford Avenue", None,
        "Ünïcode Strâsse 42nd", "west southwest street avenue",
    ]
    got = nz.normalize_series(pd.Series(raws, dtype="object")).tolist()
    want = [nz.normalize(r or "") for r in raws]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii", exclude_categories=["Cc"]),
               max_size=60))
def test_normalize_idempotent(txt):
    once = nz.normalize(txt)
    assert nz.normalize(once) == once


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abc 123#-/ÉÜstreet", max_size=30), max_size=20))
def test_series_equals_scalar_property(txts):
    got = nz.normalize_series(pd.Series(txts, dtype="object")).tolist()
    assert got == [nz.normalize(t) for t in txts]


def test_normalize_unit():
    # optimized.py:308-314
    assert nz.normalize_unit("Apt 4B") == "4B"
    assert nz.normalize_unit("#12") == "12"
    assert nz.normalize_unit("suite 300") == "300"
    assert nz.normalize_unit("unit#7") == "7"
    assert nz.normalize_unit("") == ""
    s = nz.normalize_unit_series(pd.Series(["Apt 4B", "#12", None, "STE 9"]))
    assert s.tolist() == ["4B", "12", "", "9"]


def test_split_street_unit():
    # optimized.py:44-55
    assert nz.split_street_unit("main st apt 4b") == ("main st", "4B")
    assert nz.split_street_unit("berry st") == ("berry st", "")
    assert nz.split_street_unit("") == ("", "")
    assert nz.split_street_unit("bedford ave unit 12") == ("bedford ave", "12")


def test_soundex_reference_quirks():
    # optimized.py:235-251 — first letter participates in dup check,
    # unmapped chars don't reset the last code
    assert nz.soundex("") == "0000"
    assert nz.soundex("Robert") == "R163"
    assert nz.soundex("B") == "B000"
    # 'bb' dedups against code of prior 'b'
    assert nz.soundex("Abb") == "A100"
    # vowel between does NOT reset (reference quirk): 'b a b' -> only one '1'
    assert nz.soundex("bab") == "B100"


def test_extract_keywords():
    # ultimate_address_matcher.py:740-758
    kw = nz.extract_keywords("The 55 Berry Street at Brooklyn")
    assert "berry" in kw and "brooklyn" in kw
    assert "the" not in kw and "at" not in kw
    assert kw.count("street") >= 1  # street-type token re-appended
