"""Address parsing kernels.

Faithful re-implementations of BOTH reference parsers' deterministic
paths (the usaddress CRF library is optional in the reference and not
present here, so the regex/token fallback paths — which the reference
itself uses without it — are the spec):

- ``parse_address``       — ``optimized.py:357-441`` (``_fallback_parse``)
- ``parse_components``    — ``ultimate_address_matcher.py:440-468`` fallback:
    ``_extract_unit`` (U:470-504), ``_extract_house_number`` (U:506-520),
    ``_separate_street_and_location`` (U:522-544), ``_parse_street``
    (U:546-576), ``_parse_location`` (U:578-607)
- ``generate_variants``   — U:651-738 (+ location-augmented variants
    U:609-649), ``generate_unit_variants`` — U:1260-1299

All functions are pure; quirks of the reference are preserved and
unit-tested against the canonical corpus (U:1772-1778).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from address_address_matching_ray.functions.normalize import normalize

US_STATES = {
    "al", "ak", "az", "ar", "ca", "co", "ct", "de", "fl", "ga", "hi", "id",
    "il", "in", "ia", "ks", "ky", "la", "me", "md", "ma", "mi", "mn", "ms",
    "mo", "mt", "ne", "nv", "nh", "nj", "nm", "ny", "nc", "nd", "oh", "ok",
    "or", "pa", "ri", "sc", "sd", "tn", "tx", "ut", "vt", "va", "wa", "wv",
    "wi", "wy",
}
STATE_ABBREVS_UPPER = {s.upper() for s in US_STATES}

# ── ultimate matcher lookup tables (U:150-186) ──
STREET_TYPES = {
    "street": "st", "avenue": "ave", "boulevard": "blvd", "drive": "dr",
    "road": "rd", "lane": "ln", "court": "ct", "place": "pl", "way": "way",
    "terrace": "ter", "circle": "cir", "parkway": "pkwy", "highway": "hwy",
}
CITY_MAPPING = {
    "brooklyn": "brooklyn", "manhattan": "manhattan", "queens": "queens",
    "bronx": "bronx", "staten island": "staten island", "nyc": "new york",
}
STREET_VARIANTS = {
    "broadway": ["broadway", "broadway ave", "broadway avenue"],
    "kent": ["kent", "kent ave", "kent avenue"],
    "berry": ["berry", "berry st", "berry street"],
    "jackson": ["jackson", "jackson st", "jackson street"],
    "north 3rd": ["north 3rd", "n 3rd", "north 3rd st", "n 3rd st"],
    "north 11th": ["north 11th", "n 11th", "north 11th st", "n 11th st"],
    "woodpoint": ["woodpoint", "woodpoint rd", "woodpoint road"],
    "metropolitan": ["metropolitan", "metropolitan ave", "metropolitan avenue"],
    "grand": ["grand", "grand st", "grand street"],
    "bedford": ["bedford", "bedford ave", "bedford avenue"],
    "marcy": ["marcy", "marcy ave", "marcy avenue"],
    "stagg": ["stagg", "stagg st", "stagg street"],
    "maspeth": ["maspeth", "maspeth ave", "maspeth avenue"],
    "union": ["union", "union ave", "union avenue"],
    "graham": ["graham", "graham ave", "graham avenue"],
}

_ZIP_RE = re.compile(r"\b(\d{5})(?:-\d{4})?\b")                     # O:365
_DIGIT_RE = re.compile(r"\d")
_UNIT_PATTERNS = [re.compile(p, re.IGNORECASE) for p in (            # U:482-489
    r"^([A-Z0-9]{1,3})\s+",
    r"\b(apt|suite|unit|#)\s*([A-Z0-9]{1,3})\b",
    r"\b([A-Z0-9]{1,3})\b(?=\s+\d)",
    r"\b([A-Z0-9]{1,3})\s+(?=\d)",
    r"^([A-Z0-9]{1,3})[-\s]",
    r"\b([A-Z0-9]{1,3})\b(?=\s+[A-Z])",
)]
_UNIT_SHAPE_RE = re.compile(r"^[A-Z0-9]{1,3}$")
_HOUSE_PATTERNS = [re.compile(p) for p in (                          # U:509-513
    r"^(\d+[A-Za-z]*)",
    r"^(\d+-\d+)",
    r"\b(\d+[A-Za-z]*)\s+[A-Za-z]",
)]
_SEPARATORS = [",", " - ", " – ", " — "]                   # U:525
_SHORT_STREET_TYPES = ["st", "ave", "rd", "dr", "blvd", "ln", "ct", "pl"]


@dataclass
class ParsedAddress:
    """optimized.py:159-173 — six flat components."""
    house: str = ""
    street: str = ""
    unit: str = ""
    city: str = ""
    state: str = ""
    zip: str = ""
    raw: dict = field(default_factory=dict)

    def normalized(self) -> str:                                     # O:169-173
        parts = [self.house, self.street]
        if self.unit:
            parts.append(f"#{self.unit}")
        parts += [self.city, self.state, self.zip]
        return normalize(" ".join(p for p in parts if p))


@dataclass
class AddressComponents:
    """ultimate_address_matcher.py:36-90 — richer component set."""
    unit: str = ""
    house_number: str = ""
    street_name: str = ""
    street_type: str = ""
    city: str = ""
    state: str = ""
    zip_code: str = ""
    country: str = "US"

    def to_string(self, format_type: str = "full") -> str:           # U:48-90
        if format_type == "full":
            keys = ("unit", "house_number", "street_name", "street_type",
                    "city", "state", "zip_code")
            return " ".join(getattr(self, k) for k in keys if getattr(self, k))
        if format_type == "street_only":
            keys = ("house_number", "street_name", "street_type")
            return " ".join(getattr(self, k) for k in keys if getattr(self, k))
        if format_type == "likely_seller":
            parts = [getattr(self, k) for k in
                     ("house_number", "street_name", "street_type") if getattr(self, k)]
            if self.unit:
                parts.append(f"Apt {self.unit}")
            return " ".join(parts)
        return ""


# ──────────────────────────────────────────────────────────────
# optimized.py parser (fallback path)
# ──────────────────────────────────────────────────────────────

def parse_address(addr: str) -> ParsedAddress:
    """``AddressParser._fallback_parse`` — optimized.py:357-441.

    Runs on the *normalized* string (the reference normalizes first at
    O:360-361), extracting zip → house → state → city (≤2 trailing
    non-directional, non-numeric tokens) → unit (#x / apt x) → street
    = remainder.  NY/NY city alias preserved (O:404).
    """
    if not addr:
        return ParsedAddress()
    addr = normalize(addr)

    zip_match = _ZIP_RE.search(addr)
    zip_code = zip_match.group(1) if zip_match else ""
    if zip_code:
        addr = addr.replace(zip_code, "").strip()

    tokens = addr.split()
    if not tokens:
        return ParsedAddress(zip=zip_code)

    house = ""
    if tokens and tokens[0].isdigit():
        house = tokens.pop(0)

    state = ""
    if tokens and tokens[-1] in US_STATES:
        state = tokens.pop()

    city_tokens: list[str] = []
    while tokens:
        last = tokens[-1]
        if last in {"n", "s", "e", "w", "ne", "nw", "se", "sw",
                    "st", "ave", "blvd", "rd", "dr", "ln"}:
            break
        if _DIGIT_RE.search(last):
            break
        city_tokens.insert(0, tokens.pop())
        if len(city_tokens) == 2:
            break
    city = " ".join(city_tokens)
    if city.upper() == "NY" and state.upper() == "NY":
        city = "NEW YORK"

    unit = ""
    for i, tok in enumerate(tokens):
        if tok.startswith("#"):
            unit = tok.lstrip("#")
            tokens.pop(i)
            break
        if tok in {"apt", "unit", "suite", "ste"} and i + 1 < len(tokens):
            unit = tokens[i + 1].lstrip("#")
            del tokens[i:i + 2]
            break

    street = " ".join(tokens)
    unit = unit.upper()
    return ParsedAddress(
        house=house, street=street, unit=unit, city=city, state=state,
        zip=zip_code,
        raw={"AddressNumber": house, "Street": street,
             "OccupancyIdentifier": unit, "PlaceName": city,
             "StateName": state, "ZipCode": zip_code},
    )


# ──────────────────────────────────────────────────────────────
# ultimate matcher parser (fallback path)
# ──────────────────────────────────────────────────────────────

def extract_unit(address: str) -> str:
    """U:470-504 — six regex patterns, state abbreviations excluded."""
    for pat in _UNIT_PATTERNS:
        m = pat.search(address)
        if m:
            unit = (m.group(2) if len(m.groups()) == 2 else m.group(1)).upper()
            if _UNIT_SHAPE_RE.match(unit) and unit not in STATE_ABBREVS_UPPER:
                return unit
    return ""


def extract_house_number(address: str) -> str:
    """U:506-520 — anchored ``re.match`` over three patterns."""
    for pat in _HOUSE_PATTERNS:
        m = pat.match(address)
        if m:
            return m.group(1)
    return ""


_ZIP_TOKEN_RE = re.compile(r"^(\d{5})(?:-\d{4})?$")


def separate_street_and_location(address: str) -> tuple[str, str]:
    """U:522-544."""
    for sep in _SEPARATORS:
        if sep in address:
            left, right = address.split(sep, 1)
            return left.strip(), right.strip()
    words = address.split()
    for i, word in enumerate(words):
        if (len(word) == 2 and word.upper() in {"NY", "NJ", "CA", "TX", "FL"}) or \
           _ZIP_TOKEN_RE.match(word):
            return " ".join(words[:i]), " ".join(words[i:])
    return address, ""


def parse_street(street_part: str) -> tuple[str, str]:
    """U:546-576 — back-to-front street-type scan."""
    if not street_part:
        return "", ""
    words = street_part.split()
    street_name, street_type = "", ""
    for i in range(len(words) - 1, -1, -1):
        w = words[i].lower()
        if w in STREET_TYPES:
            street_type = STREET_TYPES[w]
            street_name = " ".join(words[:i])
            break
        if w in _SHORT_STREET_TYPES:
            street_type = w
            street_name = " ".join(words[:i])
            break
    if not street_type and words:
        last = words[-1].lower()
        if last in STREET_TYPES:
            street_type = STREET_TYPES[last]
            street_name = " ".join(words[:-1])
        else:
            street_name = street_part
    return street_name.strip(), street_type


def parse_location(location_part: str, default_city: str = "Brooklyn",
                   default_state: str = "NY") -> tuple[str, str, str]:
    """U:578-607.  The Brooklyn/NY defaults are a reference quirk kept
    behind arguments (SURVEY §2.2 M12)."""
    if not location_part:
        return default_city, default_state, ""
    words = location_part.split()
    city, state, zip_code = default_city, default_state, ""
    for w in words:
        m = _ZIP_TOKEN_RE.match(w)
        if m:
            # ZIP+4 keeps its 5-digit base (usaddress ZipCode semantics;
            # the formulas and blocking keys compare on the base)
            zip_code = m.group(1)
            break
    for w in words:
        if len(w) == 2 and w.upper() in {"NY", "NJ", "CA", "TX", "FL"}:
            state = w.upper()
            break
    for w in words:
        if w.lower() in CITY_MAPPING:
            city = CITY_MAPPING[w.lower()]
            break
    return city, state, zip_code


# ── optional usaddress CRF branch (the reference's true primary path,
# U:373-437).  The wheel is absent in this environment, so the import is
# optional; when present, ``parse_components`` prefers the CRF and falls
# back to the emulated path below when the tagger raises (the reference
# falls back to its *ungated* regex composition, U:441-455 — we fall
# back to the production-shaped emulation instead, same documented
# delta as the no-usaddress case). ──
try:                                                        # pragma: no cover
    import usaddress as _usaddress
except ImportError:
    _usaddress = None

_UNIT_SHAPE3_RE = re.compile(r"^[A-Z0-9]{1,3}$")
_STREET_LEADING_NUM_RE = re.compile(r"^(\d+)\s+(.+)")
_HOUSE_UNIT_COMBO_RE = re.compile(r"^([A-Z0-9]{1,3})\s+\d")
_HOUSE_UNIT_SPLIT_RE = re.compile(r"^([A-Z0-9]{1,3})\s+(\d+)")
_CRF_UNIT_GATE_RE = re.compile(r"^[A-Z0-9]{1,3}\s+\d")


def parse_components_crf(address: str, tag=None) -> AddressComponents | None:
    """usaddress-backed primary parse — U:373-437 verbatim semantics:
    tag → component pick (OccupancyIdentifier|SubaddressIdentifier,
    AddressNumber, StreetNamePreDirectional+StreetName joined,
    StreetNamePostType lowercased, PlaceName, StateName, ZipCode) →
    the two documented unit/house mis-parse repairs (U:388-410) →
    gated custom unit extraction (U:417-421) → house fallback
    (U:423-425).

    ``tag`` injects a tagger for tests; defaults to ``usaddress.tag``.
    Returns ``None`` when no tagger is available or it raises, so the
    caller can fall back.
    """
    tagger = tag if tag is not None else (
        _usaddress.tag if _usaddress is not None else None)
    if tagger is None:
        return None
    cleaned = address.strip()
    try:
        parsed, _addr_type = tagger(cleaned)
    except Exception:
        return None

    unit = parsed.get("OccupancyIdentifier", "") or \
        parsed.get("SubaddressIdentifier", "")
    house_number = parsed.get("AddressNumber", "")
    street_pre_dir = parsed.get("StreetNamePreDirectional", "")
    street_name = parsed.get("StreetName", "")
    street_post_type = parsed.get("StreetNamePostType", "")
    city = parsed.get("PlaceName", "")
    state = parsed.get("StateName", "")
    zip_code = parsed.get("ZipCode", "")

    # U:388-410 — repair the two common usaddress unit+house confusions.
    if not unit and house_number and street_name:
        # Pattern 1: AddressNumber is really the unit ("1H") and
        # StreetName swallowed the house ("55 Berry").
        if _UNIT_SHAPE3_RE.match(house_number) and \
                _STREET_LEADING_NUM_RE.match(street_name):
            m = _STREET_LEADING_NUM_RE.match(street_name)
            if m and len(house_number) <= 3 and house_number.isalnum():
                unit = house_number
                house_number = m.group(1)
                street_name = m.group(2)
        # Pattern 2: AddressNumber holds unit+house ("3D 130").
        elif _HOUSE_UNIT_COMBO_RE.match(house_number):
            m = _HOUSE_UNIT_SPLIT_RE.match(house_number)
            if m:
                unit = m.group(1)
                house_number = m.group(2)

    street_name_combined = " ".join(
        p for p in (street_pre_dir, street_name) if p)

    # U:417-421 — custom unit extraction only behind the leading-token
    # gate; U:423-425 — house fallback is ungated.
    if not unit and _CRF_UNIT_GATE_RE.match(cleaned):
        unit = extract_unit(cleaned)
    if not house_number:
        house_number = extract_house_number(cleaned)

    return AddressComponents(
        unit=unit, house_number=house_number,
        street_name=street_name_combined,
        street_type=street_post_type.lower() if street_post_type else "",
        city=city, state=state, zip_code=zip_code)


# unit-first pattern gate — U:416-424: the reference's PRIMARY
# (usaddress) path only runs custom unit extraction when the address
# starts "``<short token> <digit…>``".  We additionally require a letter
# in the token: a purely numeric lead is a house number (the ungated
# fallback would swallow every 3-digit house as a unit — U:482 pattern 1
# — which the reference only hits when usaddress is absent).
_UNIT_FIRST_RE = re.compile(r"^([0-9]*[A-Za-z][A-Za-z0-9]{0,2})\s+\d")
# "#" carries no word boundary after a space, so it gets its own branch
# (the faithful U:482 pattern 2 misses "St #7F"; usaddress would not)
_EXPLICIT_UNIT_RE = re.compile(
    r"(?:\b(apt|suite|unit|ste)\.?\s*|#\s*)([A-Z0-9]{1,3})\b", re.IGNORECASE)
_HOUSE_RANGE_FIRST = [re.compile(p) for p in (
    r"^(\d+-\d+)",            # ranges whole, like usaddress ("85-101")
    r"^(\d+[A-Za-z]*)",
    r"\b(\d+[A-Za-z]*)\s+[A-Za-z]",
)]


def parse_components(address: str) -> AddressComponents:
    """Primary-path parse (the reference's usaddress route with its
    mis-parse repairs, U:366-439).  When the optional ``usaddress``
    wheel is importable, the real CRF runs first
    (``parse_components_crf``); otherwise — or when the tagger raises —
    the route is re-expressed with the deterministic extractors:
    unit-first gate → explicit apt/unit/# marker → house
    (range kept whole) → street/location split → street name/type →
    location.

    Documented delta vs the *fallback* composition (U:440-468): the
    ungated ``_extract_unit`` there mis-parses every short leading house
    number as a unit ("490 Court St" → unit=490); the production path
    (usaddress present) does not, and this engine follows the
    production path.
    """
    if not address or not address.strip():
        return AddressComponents()
    if _usaddress is not None:
        crf = parse_components_crf(address)
        if crf is not None:
            return crf
    cleaned = address.strip()
    unit = ""
    m = _UNIT_FIRST_RE.match(cleaned)
    if m and m.group(1).upper() not in STATE_ABBREVS_UPPER:
        unit = m.group(1).upper()
        cleaned = cleaned[m.end(1):].strip()
    else:
        m2 = _EXPLICIT_UNIT_RE.search(cleaned)
        if m2:
            unit = m2.group(2).upper()
            cleaned = (cleaned[:m2.start()] + " " + cleaned[m2.end():]).strip()
    house_number = ""
    for pat in _HOUSE_RANGE_FIRST:
        hm = pat.match(cleaned)
        if hm:
            house_number = hm.group(1)
            break
    if house_number:
        cleaned = cleaned.replace(house_number, "", 1).strip()
    street_part, location_part = separate_street_and_location(cleaned)
    # peel a trailing known-city token off the street part (usaddress
    # tags it PlaceName; the regex splitter leaks it into the street
    # when no street type follows — "60 Broadway Brooklyn, NY")
    city_hint = ""
    words = street_part.split()
    while words and words[-1].lower() in CITY_MAPPING:
        city_hint = (words[-1].lower() + (" " + city_hint if city_hint else "")).strip()
        words = words[:-1]
    if city_hint:
        street_part = " ".join(words)
        city_hint = CITY_MAPPING.get(city_hint, city_hint).title()
    street_name, street_type = parse_street(street_part)
    city, state, zip_code = parse_location(location_part)
    if city_hint:
        city = city_hint
    return AddressComponents(
        unit=unit, house_number=house_number, street_name=street_name,
        street_type=street_type, city=city, state=state, zip_code=zip_code)


def parse_components_fallback(address: str) -> AddressComponents:
    """The faithful degraded-path composition (U:440-468), quirks and
    all — kept for parity reference and tests; not used on the data
    path (see ``parse_components`` docstring)."""
    if not address or not address.strip():
        return AddressComponents()
    cleaned = address.strip()
    unit = extract_unit(cleaned)
    if unit:
        cleaned = cleaned.replace(unit, "", 1).strip()
    house_number = extract_house_number(cleaned)
    if house_number:
        cleaned = cleaned.replace(house_number, "", 1).strip()
    street_part, location_part = separate_street_and_location(cleaned)
    street_name, street_type = parse_street(street_part)
    city, state, zip_code = parse_location(location_part)
    return AddressComponents(
        unit=unit, house_number=house_number, street_name=street_name,
        street_type=street_type, city=city, state=state, zip_code=zip_code)


# ──────────────────────────────────────────────────────────────
# Variant generation (the blocking-key fan-out)
# ──────────────────────────────────────────────────────────────

def _street_with_location(c: AddressComponents) -> str:              # U:609-627
    parts = [p for p in (c.house_number, c.street_name, c.street_type,
                         c.city, c.state, c.zip_code) if p]
    return " ".join(parts)


def _likely_seller_with_location(c: AddressComponents) -> str:       # U:629-649
    parts = [p for p in (c.house_number, c.street_name, c.street_type) if p]
    if c.unit:
        parts.append(f"Apt {c.unit}")
    parts += [p for p in (c.city, c.state, c.zip_code) if p]
    return " ".join(parts)


def generate_variants(address: str, max_variants: int = 15) -> list[str]:
    """U:651-738 — base + unit-format + street-name + simplified +
    unit-stripped variants, order-preserving dedup, capped."""
    c = parse_components(address)
    variants: list[str] = []

    base = [c.to_string("full"), _street_with_location(c),
            _likely_seller_with_location(c)]
    variants.extend(v for v in base if v)

    if c.unit:                                                       # U:666-678
        hn, sn, st, u = c.house_number, c.street_name, c.street_type, c.unit
        unit_variants = [
            f"{hn} {sn} {st} Apt {u}", f"{hn} {sn} {st} Unit {u}",
            f"{hn} {sn} {st} #{u}", f"{hn} {sn} {st} {u}",
            f"{hn} {sn} Apt {u}", f"{hn} {sn} Unit {u}",
            f"{hn} {sn} #{u}", f"{hn} {sn} {u}",
        ]
        variants.extend(v for v in unit_variants if v)

    if c.street_name:                                                # U:681-704
        street_lower = c.street_name.lower()
        for base_name, variant_list in STREET_VARIANTS.items():
            if base_name in street_lower:
                for variant in variant_list[:3]:
                    new_street = street_lower.replace(base_name, variant)
                    if c.house_number:
                        nv = f"{c.house_number} {new_street}"
                        if c.unit:
                            nv += f" Apt {c.unit}"
                    else:
                        nv = new_street
                    if c.city:
                        nv += f" {c.city}"
                    if c.state:
                        nv += f" {c.state}"
                    variants.append(nv)
                break

    if c.house_number and c.street_name:                             # U:707-713
        simplified = f"{c.house_number} {c.street_name}"
        if c.city:
            simplified += f" {c.city}"
        if c.state:
            simplified += f" {c.state}"
        variants.append(simplified)

    if c.unit:                                                       # U:716-725
        no_unit = AddressComponents(
            house_number=c.house_number, street_name=c.street_name,
            street_type=c.street_type, city=c.city, state=c.state,
            zip_code=c.zip_code)
        variants.append(no_unit.to_string("full"))

    unique: list[str] = []                                           # U:728-738
    seen: set[str] = set()
    for v in variants:
        if v and v.strip() and v not in seen:
            unique.append(v.strip())
            seen.add(v)
            if len(unique) >= max_variants:
                break
    return unique


_UNIT_NUM_ALPHA_RE = re.compile(r"^\d+[A-Z]$")
_UNIT_ALPHA_NUM_RE = re.compile(r"^[A-Z]\d+$")
_UNIT_LEAD_NUM_RE = re.compile(r"^(\d+)")


def generate_unit_variants(unit: str, speculative: bool = True) -> list[str]:
    """U:1260-1299.  ``speculative=False`` drops the fabricated
    19A/19B/19C-style expansions (SURVEY §2.2 M16) while keeping the
    format-only rewrites."""
    variants = [unit.upper().strip()]
    clean = unit.upper().strip()
    for prefix in ("#", "APT", "UNIT", "SUITE", "STE", "NO"):
        if clean.startswith(prefix):
            clean = clean[len(prefix):].strip()
    variants.append(clean)
    if _UNIT_NUM_ALPHA_RE.match(clean):
        number = _UNIT_LEAD_NUM_RE.match(clean).group(1)
        variants.append(number)
        if speculative:
            variants += [f"{number}A", f"{number}B", f"{number}C"]
    elif _UNIT_ALPHA_NUM_RE.match(clean):
        variants.append(f"{clean[1:]}{clean[0]}")
    elif clean.isdigit() and speculative:
        variants += [f"{clean}{sfx}" for sfx in "ABCD"]
    return list(dict.fromkeys(variants))
