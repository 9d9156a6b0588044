"""Deterministic text extraction + normalization + address parsing stage.

``read_parquet(pages) → map_batches(extract_parse) → extracted``
(SURVEY §7.1 step 1-2).  Stateless — plain function, Arrow in /
Arrow out.  The html→text extraction is the canonical-form invariant
(byte-identical per url, frozen by golden files in
``tests/golden/extracted_text/``) — the analog of the reference's
normalizer contract (``optimized.py:271-304``).

Output schema (``extracted``):
    doc_id uint64, url string, warc_ts timestamp[us], lang string,
    extracted_text string, addr string, norm_addr string,
    house/street_name/street_type/unit/city/state/zip string
"""

from __future__ import annotations

import html as html_mod
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from address_address_matching_ray.functions.normalize import normalize_series
from address_address_matching_ray.functions.parse import parse_components

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_WS_RE = re.compile(r"\s+")

# Address window: up to 10 word-ish tokens ending in a 5-digit zip
# (house + directional + numbered street + type + unit pair + 2-word
# city + state needs 9).
_ADDR_WINDOW_RE = re.compile(r"((?:[A-Za-z0-9#\-',.]+\s+){0,10}\d{5}(?:-\d{4})?)")
# Fallback: house number + words + street type, no zip.
_ADDR_TYPE_RE = re.compile(
    r"\b(\d+[\w-]*\s+(?:[A-Za-z0-9#']+\s+){0,5}"
    r"(?:St|Street|Ave|Avenue|Blvd|Boulevard|Rd|Road|Dr|Drive|Ln|Lane|Ct|Court|"
    r"Pl|Place|Pkwy|Parkway|Ter|Terrace|Cir|Circle|Hwy|Highway|Way|Broadway))\b",
    re.IGNORECASE)
_LEAD_TOKEN_OK_RE = re.compile(r"^(?:\d|[A-Za-z0-9]{1,3}$|#)")
# entity fast path: dominant entities as literal replaces; any other
# '&…;' falls back to html.unescape on the ORIGINAL row text
_COMMON_ENTITIES = [("&copy;", "©"), ("&nbsp;", " "),
                    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")]
_ENTITY_RE = re.compile(r"&(?:[A-Za-z][A-Za-z0-9]{1,30}|#\d{1,7}|#[xX][0-9A-Fa-f]{1,6});")


def extract_text(raw: bytes | str) -> str:
    """html → visible text, deterministically: drop script/style/comment
    blocks, strip tags, unescape entities, collapse whitespace.
    Scalar spec; the stage uses the vectorized ``extract_text_series``
    (asserted equal in tests)."""
    if raw is None:
        return ""
    s = raw.decode("utf-8", "replace") if isinstance(raw, (bytes, bytearray)) else str(raw)
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = html_mod.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_text_series(raws: list) -> list[str]:
    """Vectorized ``extract_text`` over a column: the regex chain runs
    as whole-column pandas str ops; entity unescape (Python-level) runs
    only on rows that contain '&'."""
    decoded = [
        "" if r is None else
        (r.decode("utf-8", "replace") if isinstance(r, (bytes, bytearray)) else str(r))
        for r in raws]
    s = pd.Series(decoded, dtype="object")
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    has_amp = s.str.contains("&", regex=False, na=False)
    if has_amp.any():
        # common-entity fast path: the handful of entities that dominate
        # web text are replaced as whole-column passes ('&amp;' LAST —
        # unescape resolves it once, so '&amp;copy;' must become
        # '&copy;', not '©'); rows still holding an entity-shaped
        # '&…;' afterwards take the full python unescape.
        sub = s.loc[has_amp]
        for ent, ch in _COMMON_ENTITIES:
            sub = sub.str.replace(ent, ch, regex=False)
        rest = sub.str.contains(_ENTITY_RE, na=False)
        if rest.any():
            sub.loc[rest] = s.loc[has_amp].loc[rest].map(html_mod.unescape)
        s.loc[has_amp] = sub
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s.tolist()


_ALPHA_TOKEN_RE = re.compile(r"[A-Za-z]{2,}")


def extract_address(text: str) -> str:
    """First *valid* address-like window in the text: zip-anchored token
    window (validated — a bare 5-digit number like a listing id is not
    an address: the window must keep ≥3 tokens incl. a word after
    trimming leading prose), else a house-number+street-type pattern.

    Deliberately a lazy scalar loop: round-4 measurement on 20k synth
    pages — this early-exit loop 0.27-0.31 s vs 3.0 s for a pandas
    ``str.extractall`` column pass (laziness dominates: all-windows
    extraction scans every decoy number) and 0.37 s for a regex-based
    lead-token trim (the token loop usually breaks at token 1-2, under
    regex-engine setup cost).  Don't "vectorize" this without beating
    those numbers on real extracted text."""
    for m in _ADDR_WINDOW_RE.finditer(text):
        tokens = m.group(1).split()
        start = 0
        for i, t in enumerate(tokens[:-1]):
            if _LEAD_TOKEN_OK_RE.match(t):
                start = i
                break
        else:
            start = len(tokens) - 1
        cand = tokens[start:]
        if len(cand) >= 3 and any(_ALPHA_TOKEN_RE.search(t) for t in cand):
            return " ".join(cand).strip()
    m = _ADDR_TYPE_RE.search(text)
    if m:
        return m.group(1).strip()
    return ""


def hash_url(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Stable 64-bit doc id from the url column (vectorized siphash)."""
    h = pd.util.hash_array(np.asarray(urls, dtype=object), categorize=False)
    return pa.array(h, pa.uint64())


def extract_parse(batch: pa.Table, cfg=None) -> pa.Table:
    """The stage body: html→text, address window, normalize, parse.

    With a config: input columns are renamed per ``cfg.column_map``
    (the IndexFieldMapping analog) and rows failing the reference's
    require-filters (empty query, ``require_house``/``require_zip`` —
    optimized.py:784-793, SURVEY §2.2 M18) get a non-empty
    ``reject_reason`` instead of being silently dropped; the blocking
    stage skips them and ``rejects_summary`` aggregates them (A3).
    """
    if cfg is not None and cfg.column_map:
        names = [cfg.column_map.get(c, c) for c in batch.column_names]
        batch = batch.rename_columns(names)
    n = batch.num_rows
    if "doc_id" in batch.column_names:
        doc_id = pc.cast(batch["doc_id"], pa.uint64())
    else:
        doc_id = hash_url(batch["url"])

    htmls = batch["html"].to_pylist()
    extracted = extract_text_series(htmls)
    addrs = [extract_address(t) for t in extracted]
    # parse each DISTINCT address once (same-entity listings repeat the
    # same perturbed strings) and scatter back
    codes, uniq = pd.factorize(np.asarray(addrs, dtype=object))
    parsed_u = [parse_components(a) for a in uniq]
    parsed = [parsed_u[c] for c in codes]

    norm_u = normalize_series(pd.Series(uniq, dtype="object")).to_numpy()
    norm_addr = pd.Series(norm_u[codes])

    def col(attr: str) -> pa.Array:
        return pa.array([getattr(p, attr) for p in parsed], pa.string())

    reasons = []
    req_house = bool(cfg and cfg.require_house)
    req_zip = bool(cfg and cfg.require_zip)
    for a, p in zip(addrs, parsed):
        if not a:
            reasons.append("empty_address")
        elif req_house and not p.house_number:
            reasons.append("missing_house")
        elif req_zip and not p.zip_code:
            reasons.append("missing_zip")
        else:
            reasons.append("")

    return pa.table({
        "reject_reason": pa.array(reasons, pa.string()),
        "doc_id": doc_id,
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "lang": batch["lang"],
        "extracted_text": pa.array(extracted, pa.string()),
        "addr": pa.array(addrs, pa.string()),
        "norm_addr": pa.array(norm_addr.tolist(), pa.string()),
        "house": col("house_number"),
        "street_name": col("street_name"),
        "street_type": col("street_type"),
        "unit": col("unit"),
        "city": col("city"),
        "state": col("state"),
        "zip": col("zip_code"),
    })


def extract_stage(pages, batch_size: int = 2048, cfg=None):
    """pages Dataset → extracted Dataset (stateless tasks).

    ``html`` is the only wide column; it is consumed here and dropped,
    so downstream shuffles move slim rows only.
    """
    return pages.map_batches(extract_parse, batch_format="pyarrow",
                             batch_size=batch_size,
                             fn_kwargs={"cfg": cfg})
