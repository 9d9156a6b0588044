"""Parsers vs the reference's canonical corpus (U:1772-1778).

Goldens are the reference *fallback-path* outputs (usaddress is an
optional dependency absent in both environments), traced line-by-line
from ``ultimate_address_matcher.py:440-607`` / ``optimized.py:357-441``
— quirks (``85`` as unit of a house-range, ordinal collapse eating
``1H`` → house ``1``) intentionally preserved.
"""

from address_address_matching_ray.functions import parse as P


def comp(c):
    return (c.unit, c.house_number, c.street_name, c.street_type,
            c.city, c.state, c.zip_code)


def test_parse_components_canonical():
    got = {a: comp(P.parse_components(a)) for a in [
        "85-101 North 3rd Street Brooklyn, NY 11249",
        "3R 112 Bedford Avenue Brooklyn, NY 11211",
        "1H 55 Berry Street Brooklyn, NY 11211",
        "21F 22 NORTH 6 STREET Brooklyn, NY 11249",
        "3Q 60 Broadway Brooklyn, NY 11249",
        "490 Court Street New York, NY 10007",
    ]}
    assert got["3R 112 Bedford Avenue Brooklyn, NY 11211"] == (
        "3R", "112", "Bedford", "ave", "Brooklyn", "NY", "11211")
    assert got["1H 55 Berry Street Brooklyn, NY 11211"] == (
        "1H", "55", "Berry", "st", "Brooklyn", "NY", "11211")
    assert got["21F 22 NORTH 6 STREET Brooklyn, NY 11249"] == (
        "21F", "22", "NORTH 6", "st", "Brooklyn", "NY", "11249")
    # primary path keeps house ranges whole (usaddress semantics)
    assert got["85-101 North 3rd Street Brooklyn, NY 11249"] == (
        "", "85-101", "North 3rd", "st", "Brooklyn", "NY", "11249")
    # known-city peel: "Brooklyn" moves from street to city (usaddress
    # PlaceName semantics; CITY_MAPPING values are lowercase)
    assert got["3Q 60 Broadway Brooklyn, NY 11249"] == (
        "3Q", "60", "Broadway", "", "Brooklyn", "NY", "11249")
    # plain house numbers are NOT units (primary-path gate, U:416-424)
    assert got["490 Court Street New York, NY 10007"] == (
        "", "490", "Court", "st", "Brooklyn", "NY", "10007")


def test_parse_components_fallback_quirks():
    # the faithful degraded path (U:440-468) keeps its quirks
    c = P.parse_components_fallback("85-101 North 3rd Street Brooklyn, NY 11249")
    assert comp(c) == ("85", "", "-101 North 3rd", "st", "Brooklyn", "NY", "11249")
    c = P.parse_components_fallback("490 Court Street New York, NY 10007")
    assert c.unit == "490"      # ungated pattern 1 swallows the house


def test_parse_address_canonical():
    p = P.parse_address("3R 112 Bedford Avenue Brooklyn, NY 11211")
    assert (p.house, p.street, p.city, p.state, p.zip) == (
        "", "3r 112 bedford ave", "brooklyn", "ny", "11211")
    p = P.parse_address("112 Bedford Avenue Apt 3R Brooklyn, NY 11211")
    assert (p.house, p.street, p.unit, p.city, p.state, p.zip) == (
        "112", "bedford ave", "3R", "brooklyn", "ny", "11211")
    # quirk: normalize's ordinal collapse (O:294) eats the H of "#1H"
    p = P.parse_address("55 Berry Street #1H Brooklyn NY 11211")
    assert (p.house, p.unit) == ("55", "1")
    p = P.parse_address("55 Berry Street #4B Brooklyn NY 11211")
    assert (p.house, p.unit) == ("55", "4B")
    assert P.parse_address("").house == ""
    # NY/NY city alias (O:403-404)
    p = P.parse_address("1 Centre St NY NY 10007")
    assert p.city == "NEW YORK"


def test_extractors():
    assert P.extract_unit("1H 55 Berry Street") == "1H"
    assert P.extract_unit("NY 11249") == ""            # state excluded (U:473-479)
    assert P.extract_house_number("123 Main St") == "123"
    assert P.extract_house_number("123A Main") == "123A"
    assert P.extract_house_number("123-125 Oak") == "123"  # pattern order (U:509-513)
    assert P.separate_street_and_location("55 Berry St, Brooklyn NY") == (
        "55 Berry St", "Brooklyn NY")
    assert P.separate_street_and_location("55 Berry St Brooklyn NY 11211") == (
        "55 Berry St Brooklyn", "NY 11211")
    assert P.parse_street("Berry Street") == ("Berry", "st")
    assert P.parse_street("Broadway") == ("Broadway", "")
    assert P.parse_location("") == ("Brooklyn", "NY", "")   # default geo (U:581)
    assert P.parse_location("Newark NJ 07101") == ("Brooklyn", "NJ", "07101")


def test_variants():
    v = P.generate_variants("1H 55 Berry Street Brooklyn, NY 11211")
    assert len(v) <= 15
    assert len(set(v)) == len(v)                        # order-preserving dedup
    assert v[0] == "1H 55 Berry st Brooklyn NY 11211"   # to_string("full") first
    assert "55 Berry st Apt 1H" in v                    # unit-format variant
    assert "55 Berry Brooklyn NY" in v                  # simplified
    # street-name variant from STREET_VARIANTS ('berry')
    assert any("berry street" in x for x in v)
    # no-unit query still yields variants
    v2 = P.generate_variants("200 Kent Avenue Brooklyn NY")
    assert v2 and all(x.strip() for x in v2)


def test_unit_variants():
    # U:1260-1299
    assert P.generate_unit_variants("19D") == ["19D", "19", "19A", "19B", "19C"]
    assert P.generate_unit_variants("A19") == ["A19", "19A"]
    assert P.generate_unit_variants("#7") == ["#7", "7", "7A", "7B", "7C", "7D"]
    assert P.generate_unit_variants("APT 3R") == ["APT 3R", "3R", "3", "3A", "3B", "3C"]
    # config-gated speculative expansion off (SURVEY §2.2 M16)
    assert P.generate_unit_variants("19D", speculative=False) == ["19D", "19"]
    assert P.generate_unit_variants("12", speculative=False) == ["12"]


def test_parse_components_adversarial_corpus():
    """≥25-case adversarial corpus bounding the usaddress emulation gap
    (VERDICT r1 #6): house ranges with units, directional + numbered
    street + unit-first, '#'/Ste/period-marker units after the street
    type, ZIP+4, and documented degradation quirks.  Golden values
    follow the documented primary-path semantics (U:366-439); quirks
    (Brooklyn default city, punctuation leakage on unnormalized input)
    are intentional parity."""
    got = {a: comp(P.parse_components(a)) for a in CORPUS}
    for addr, expected in CORPUS.items():
        assert got[addr] == expected, f"{addr!r}: {got[addr]} != {expected}"


CORPUS = {
    # canonical five (U:1772-1778)
    "85-101 North 3rd Street Brooklyn, NY 11249":
        ("", "85-101", "North 3rd", "st", "Brooklyn", "NY", "11249"),
    "3R 112 Bedford Avenue Brooklyn, NY 11211":
        ("3R", "112", "Bedford", "ave", "Brooklyn", "NY", "11211"),
    "1H 55 Berry Street Brooklyn, NY 11211":
        ("1H", "55", "Berry", "st", "Brooklyn", "NY", "11211"),
    "21F 22 NORTH 6 STREET Brooklyn, NY 11249":
        ("21F", "22", "NORTH 6", "st", "Brooklyn", "NY", "11249"),
    "3Q 60 Broadway Brooklyn, NY 11249":
        ("3Q", "60", "Broadway", "", "Brooklyn", "NY", "11249"),
    # house ranges with units, every marker form
    "4B 85-101 North 3rd Street Brooklyn, NY 11249":
        ("4B", "85-101", "North 3rd", "st", "Brooklyn", "NY", "11249"),
    "85-101 North 3rd Street Apt 4B Brooklyn, NY 11249":
        ("4B", "85-101", "North 3rd", "st", "Brooklyn", "NY", "11249"),
    "85-101 N 3rd St #2C Brooklyn NY 11249":
        ("2C", "85-101", "N 3rd", "st", "Brooklyn", "NY", "11249"),
    # directional + numbered street + unit-first
    "2F 301 East 89th Street New York, NY 10128":
        ("2F", "301", "East 89th", "st", "Brooklyn", "NY", "10128"),
    "12A 45 West 12 Street New York NY 10011":
        ("12A", "45", "West 12", "st", "Brooklyn", "NY", "10011"),
    "7C 200 NORTH 6TH STREET Brooklyn NY 11211":
        ("7C", "200", "NORTH 6TH", "st", "Brooklyn", "NY", "11211"),
    # '#'/Suite/Unit/Ste/period markers after the street type
    "55 Berry St #7F Brooklyn, NY 11211":
        ("7F", "55", "Berry", "st", "Brooklyn", "NY", "11211"),
    "112 Bedford Ave # 3R Brooklyn NY 11211":
        ("3R", "112", "Bedford", "ave", "Brooklyn", "NY", "11211"),
    "60 Broadway Suite 210 Brooklyn, NY 11249":
        ("210", "60", "Broadway", "", "Brooklyn", "NY", "11249"),
    "22 North 6th Street Unit 21F Brooklyn NY 11249":
        ("21F", "22", "North 6th", "st", "Brooklyn", "NY", "11249"),
    "77 Kent Avenue Apt. 4B Brooklyn, NY 11249":
        ("4B", "77", "Kent", "ave", "Brooklyn", "NY", "11249"),
    "60 Broadway Ste 4L Brooklyn NY 11249":
        ("4L", "60", "Broadway", "", "Brooklyn", "NY", "11249"),
    # ZIP+4 keeps the 5-digit base
    "490 Court Street Brooklyn, NY 11231-4512":
        ("", "490", "Court", "st", "Brooklyn", "NY", "11231"),
    "1 Main Street Newark NJ 07102-3827":
        ("", "1", "Main", "st", "Brooklyn", "NJ", "07102"),
    # degraded shapes: no house, no zip, PO box, malformed glue —
    # documented quirks (Brooklyn default; punctuation leaks without
    # upstream normalize; the reference behaves identically)
    "1000 Ocean Pkwy Brooklyn NY":
        ("", "1000", "Ocean Pkwy", "", "Brooklyn", "NY", ""),
    "Flatbush Avenue Brooklyn NY 11226":
        ("", "", "Flatbush", "ave", "Brooklyn", "NY", "11226"),
    "PO Box 1234 Brooklyn NY 11211":
        ("", "", "PO Box 1234", "", "Brooklyn", "NY", "11211"),
    "301 E 89 St New York NY":
        ("", "301", "E 89", "st", "Brooklyn", "NY", ""),
    "19 Graham Ave.(at Boerum St) Brooklyn, NY 11206":
        ("", "19", "Graham Ave.(at Boerum St)", "", "Brooklyn", "NY", "11206"),
    "248 McKibbin St.Brooklyn, NY 11206":
        ("", "248", "McKibbin St.Brooklyn", "", "Brooklyn", "NY", "11206"),
    "1H55 Berry Street Brooklyn NY 11211":
        ("", "1H", "55 Berry", "st", "Brooklyn", "NY", "11211"),
    "490 Court Street New York, NY 10007":
        ("", "490", "Court", "st", "Brooklyn", "NY", "10007"),
}


# ── optional usaddress CRF seam (U:373-437) ──
# The wheel is absent here, so a deterministic fake tagger exercises the
# tag→component mapping, the two mis-parse repairs, the gated custom
# unit extraction, and the raise→fallback route.

def _tagger_for(mapping):
    def tag(addr):
        if addr not in mapping:
            raise ValueError(f"untaggable: {addr}")
        return mapping[addr], "Street Address"
    return tag


def test_crf_standard_mapping():
    tag = _tagger_for({
        "112 N Bedford Avenue Brooklyn, NY 11211": {
            "AddressNumber": "112", "StreetNamePreDirectional": "N",
            "StreetName": "Bedford", "StreetNamePostType": "Avenue",
            "PlaceName": "Brooklyn", "StateName": "NY",
            "ZipCode": "11211", "OccupancyIdentifier": "3R"},
    })
    c = P.parse_components_crf(
        "112 N Bedford Avenue Brooklyn, NY 11211", tag=tag)
    # pre-directional joins the street; post type lowercased verbatim
    # (NOT abbreviated — U:430-431 keeps the reference quirk)
    assert comp(c) == ("3R", "112", "N Bedford", "avenue",
                       "Brooklyn", "NY", "11211")


def test_crf_repair_pattern1_unit_in_address_number():
    # AddressNumber="1H", StreetName="55 Berry" → unit/house/street fixed
    tag = _tagger_for({
        "1H 55 Berry Street Brooklyn, NY 11211": {
            "AddressNumber": "1H", "StreetName": "55 Berry",
            "StreetNamePostType": "Street", "PlaceName": "Brooklyn",
            "StateName": "NY", "ZipCode": "11211"},
    })
    c = P.parse_components_crf(
        "1H 55 Berry Street Brooklyn, NY 11211", tag=tag)
    assert comp(c) == ("1H", "55", "Berry", "street",
                       "Brooklyn", "NY", "11211")


def test_crf_repair_pattern2_combined_address_number():
    tag = _tagger_for({
        "3D 130 Stagg Street Brooklyn, NY 11206": {
            "AddressNumber": "3D 130", "StreetName": "Stagg",
            "StreetNamePostType": "Street", "PlaceName": "Brooklyn",
            "StateName": "NY", "ZipCode": "11206"},
    })
    c = P.parse_components_crf(
        "3D 130 Stagg Street Brooklyn, NY 11206", tag=tag)
    assert comp(c) == ("3D", "130", "Stagg", "street",
                       "Brooklyn", "NY", "11206")


def test_crf_gated_custom_unit_and_house_fallback():
    # tag found neither unit nor house; leading "2B 77" passes the gate
    tag = _tagger_for({
        "2B 77 Kent Avenue Brooklyn NY 11249": {
            "StreetName": "Kent", "StreetNamePostType": "Avenue",
            "PlaceName": "Brooklyn", "StateName": "NY",
            "ZipCode": "11249"},
    })
    c = P.parse_components_crf(
        "2B 77 Kent Avenue Brooklyn NY 11249", tag=tag)
    assert c.unit == "2B"
    # reference quirk (U:423-425): the house fallback re-scans the
    # ORIGINAL string, so `^(\d+[A-Za-z]*)` re-captures the unit token
    assert c.house_number == "2B"
    # ungated address does NOT run custom unit extraction
    tag2 = _tagger_for({
        "490 Court Street Brooklyn NY 11231": {
            "StreetName": "Court", "StreetNamePostType": "Street",
            "PlaceName": "Brooklyn", "StateName": "NY",
            "ZipCode": "11231"},
    })
    c2 = P.parse_components_crf(
        "490 Court Street Brooklyn NY 11231", tag=tag2)
    assert c2.unit == ""
    assert c2.house_number == "490"     # house fallback is ungated


def test_crf_raise_falls_back_to_emulation(monkeypatch):
    # a tagger that always raises → parse_components must return the
    # emulated-path result for every corpus entry (identical to the
    # no-usaddress route)
    class _FakeUsaddress:
        @staticmethod
        def tag(addr):
            raise RuntimeError("RepeatedLabelError-ish")

    want = {a: comp(P.parse_components(a)) for a in [
        "85-101 North 3rd Street Brooklyn, NY 11249",
        "3R 112 Bedford Avenue Brooklyn, NY 11211",
        "490 Court Street New York, NY 10007",
    ]}
    monkeypatch.setattr(P, "_usaddress", _FakeUsaddress)
    got = {a: comp(P.parse_components(a)) for a in want}
    assert got == want
