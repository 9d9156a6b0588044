"""Text / address normalization kernels.

Re-implements the reference's canonical-form functions (semantics
documented per function with ``optimized.py`` line cites) as pure
Python scalars *and* vectorized pandas/pyarrow variants for hot-path
``map_batches`` use.  The scalar and vectorized paths are asserted
equal in tests — the scalar path is the spec, the vectorized path is
the engine.

No external deps: ``unidecode`` is replaced by an NFKD ASCII fold
(identical on Latin-accented text, the only non-ASCII class the
reference corpus contains) and ``rapidfuzz`` lives in ``fuzzy.py``.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

# ──────────────────────────────────────────────────────────────
# Abbreviation tables — optimized.py:259-269.  The reference merges
# {**STREET_ABB, **DIR_ABB}; DIR_ABB's keys are a subset with identical
# values, so the effective ordered replacement list is STREET_ABB.
# ──────────────────────────────────────────────────────────────
STREET_ABB: dict[str, str] = {
    "north": "n", "south": "s", "east": "e", "west": "w",
    "northeast": "ne", "northwest": "nw", "southeast": "se", "southwest": "sw",
    "street": "st", "avenue": "ave", "boulevard": "blvd", "drive": "dr",
    "lane": "ln", "road": "rd", "court": "ct", "place": "pl",
}
DIR_ABB: dict[str, str] = {
    "north": "n", "south": "s", "east": "e", "west": "w",
    "northeast": "ne", "northwest": "nw", "southeast": "se", "southwest": "sw",
}
_ABB_ORDER: list[tuple[str, str]] = list({**STREET_ABB, **DIR_ABB}.items())

# optimized.py:284-285
_PUNCT_RE = re.compile(r"[^\w\s\-#/]")
_WS_RE = re.compile(r"\s+")
# optimized.py:294 — ordinal collapse ("92nd" → "92", incl. typo suffixes)
_ORDINAL_RE = re.compile(r"\b(\d+)[-_]?(st|nd|rd|th|ht|tt|thh|ndd|rdd|h|t)\b")
_ABB_RES: list[tuple[re.Pattern, str]] = [
    (re.compile(rf"\b{full}\b"), abbr) for full, abbr in _ABB_ORDER
]
# Fused single-pass form for the vectorized path: one bounded
# alternation (longest-first, so first-match == longest-match) with a
# dict-lookup replacement.  Equivalent to the sequential chain because
# (a) no replacement output ("n", "st", "ave", …) matches any pattern
# word, so there are no chained rewrites, and (b) the trailing \b
# already forces whole-word matches.  Asserted scalar≡vector by the
# normalize property tests.
_ABB_MAP: dict[str, str] = dict(_ABB_ORDER)
_ABB_ALT_RE = re.compile(
    r"\b(?:" + "|".join(sorted(_ABB_MAP, key=len, reverse=True)) + r")\b")


def _abb_repl(m: re.Match) -> str:
    return _ABB_MAP[m.group(0)]

# optimized.py:44 — embedded apartment/unit inside a street string
APT_PAT = re.compile(r"\b(?:apt|unit|ste|suite|#)\s*([a-z0-9-]+)\b", re.I)

# optimized.py:311 — unit prefix strip
_UNIT_PREFIX_RE = re.compile(r"^(apt|unit|ste|suite|#)+")


def ascii_fold(txt: str) -> str:
    """``unidecode`` stand-in: NFKD-decompose and drop combining marks.

    Matches unidecode on Latin-accented input (é→e, ü→u, …); exotic
    scripts degrade to '' instead of a romanization — acceptable, the
    data path is ASCII-dominant web text and the fold is deterministic.
    """
    if txt.isascii():
        return txt
    return unicodedata.normalize("NFKD", txt).encode("ascii", "ignore").decode("ascii")


def normalize(txt: str) -> str:
    """Canonical address/text normalization — optimized.py:271-304.

    fold → lower → strip punct (keep ``-#/``) → collapse whitespace →
    abbreviate street types & directionals → collapse ordinals.
    Stateless and idempotent; the reference's thread-locked cache
    (optimized.py:256-257) is unnecessary once vectorized.
    """
    if not txt:
        return ""
    txt = ascii_fold(txt).lower()
    txt = _PUNCT_RE.sub(" ", txt)
    txt = _WS_RE.sub(" ", txt).strip()
    for pat, abbr in _ABB_RES:
        txt = pat.sub(abbr, txt)
    txt = _ORDINAL_RE.sub(r"\1", txt)
    return txt


def normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized ``normalize`` over a string Series (hot path).

    Same regex chain as the scalar spec, executed as whole-column
    pandas str ops (compiled C loops) instead of per-row Python.
    """
    s = s.fillna("")
    if not s.map(str.isascii).all():
        s = s.map(ascii_fold)
    s = s.str.lower()
    s = s.str.replace(_PUNCT_RE, " ", regex=True)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    s = s.str.replace(_ABB_ALT_RE, _abb_repl, regex=True)
    s = s.str.replace(_ORDINAL_RE, r"\1", regex=True)
    return s


def normalize_array(arr) -> np.ndarray:
    """``normalize`` over any array-like → numpy object array.

    Normalizes each DISTINCT string once (pair batches repeat the same
    component strings heavily) and scatters results back.
    """
    a = np.asarray(arr, dtype=object)
    if len(a) == 0:
        return a
    codes, uniques = pd.factorize(a)
    norm_u = normalize_series(pd.Series(uniques, dtype="object")).to_numpy()
    out = norm_u[codes]
    if (codes < 0).any():                       # NaN/None slots
        out = out.copy()
        out[codes < 0] = ""
    return out


def normalize_unit(unit: str) -> str:
    """Unit normalization — optimized.py:308-314."""
    if not unit:
        return ""
    unit = unit.lower().replace(" ", "")
    unit = _UNIT_PREFIX_RE.sub("", unit)
    return unit.upper()


def normalize_unit_series(s: pd.Series) -> pd.Series:
    s = s.fillna("").str.lower().str.replace(" ", "", regex=False)
    s = s.str.replace(_UNIT_PREFIX_RE, "", regex=True)
    return s.str.upper()


def split_street_unit(text: str) -> tuple[str, str]:
    """Pull an embedded apartment/unit out of a street string —
    optimized.py:46-55 (regex at :44)."""
    if not text:
        return text, ""
    m = APT_PAT.search(text)
    if not m:
        return text, ""
    unit = m.group(1).upper()
    street = (text[: m.start()] + text[m.end():]).strip()
    return street, unit


_SOUNDEX_MAP = {}
for _letters, _code in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                        ("L", "4"), ("MN", "5"), ("R", "6")):
    for _ch in _letters:
        _SOUNDEX_MAP[_ch] = _code


def soundex(name: str) -> str:
    """Soundex exactly as the reference computes it — optimized.py:235-251.

    Quirk preserved: un-mapped chars (vowels, H/W/Y, digits) neither
    emit a code nor reset the last-emitted code, and the first letter
    participates in the duplicate check.
    """
    if not name:
        return "0000"
    name = name.upper()
    out = name[0]
    for ch in name[1:]:
        code = _SOUNDEX_MAP.get(ch)
        if code is not None and code != out[-1]:
            out += code
    return out[:4].ljust(4, "0")


def phonetic_code(name: str) -> str:
    """Blocking-grade phonetic code: soundex of the letters + the
    digits verbatim.  Soundex ignores digits entirely, so numbered
    streets ("East 89th") would all collapse to one degenerate block
    ("E000") — digits carry exact signal and stay."""
    digits = "".join(ch for ch in name if ch.isdigit())
    return f"{soundex(name)}{digits}"


def phonetic_code_array(arr) -> np.ndarray:
    """``phonetic_code`` over an array — computed once per DISTINCT
    value (street names repeat heavily) and scattered back."""
    a = np.asarray(arr, dtype=object)
    if len(a) == 0:
        return a
    codes, uniq = pd.factorize(a)
    vals = np.array([phonetic_code(u) if isinstance(u, str) else ""
                     for u in uniq], dtype=object)
    out = vals[codes]
    if (codes < 0).any():
        out = out.copy()
        out[codes < 0] = phonetic_code("")
    return out


# ──────────────────────────────────────────────────────────────
# Tokenization / keywords — ultimate_address_matcher.py:740-758
# ──────────────────────────────────────────────────────────────
STOP_WORDS = {"the", "and", "or", "of", "in", "at", "to", "for", "with", "by"}
_KEYWORD_CLEAN_RE = re.compile(r"[^\w\s]")
_STREET_TYPE_TOKENS = {"st", "ave", "blvd", "rd", "dr", "ln", "ct", "pl",
                       "way", "ter", "cir", "pkwy", "hwy",
                       "street", "avenue", "boulevard", "road", "drive",
                       "lane", "court", "place", "terrace", "circle",
                       "parkway", "highway"}


def extract_keywords(address: str) -> list[str]:
    """Meaningful keywords — ultimate_address_matcher.py:740-758:
    strip punctuation, drop stop words and short tokens, then
    re-append street-type tokens (they survive regardless of length)."""
    cleaned = _KEYWORD_CLEAN_RE.sub(" ", address.lower())
    words = cleaned.split()
    keywords = [w for w in words if w not in STOP_WORDS and len(w) > 2]
    keywords += [w for w in words if w in _STREET_TYPE_TOKENS]
    return keywords


def tokenize(txt: str) -> list[str]:
    """Plain whitespace tokenization of normalized text (blocking/Jaccard)."""
    return txt.split()
