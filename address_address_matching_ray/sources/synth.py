"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md F1/F2/F4).

Schema per ``BASELINE.json.input_hint``:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Every row is derived *statelessly* from its integer id + seed (pure
hash arithmetic, no RNG state) so generation streams at any scale via
``ray.data.range(n).map_batches(...)`` — the same function makes 1k
rows for unit tests and 10^12-row shards on a cluster, partition by
partition, with no coordination.

Planted structure:
- duplicate clusters of size 1-5 (address re-listed across sites with
  format perturbations) + ``HOT_CLUSTERS`` clusters of ~``HOT_SIZE``
  members exercising skew salting (FIXTURES.md F1)
- URL-canonicalization duplicates (``?utm_*``, trailing ``/``,
  http↔https, ``www.``)
- cross-cluster confusables: same street+city, different house number
  (true negatives that share blocking keys)
- the five canonical reference parse cases (U:1772-1778) as cluster
  seeds (FIXTURES.md F2)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HOT_CLUSTERS = 3          # clusters of ~HOT_SIZE pages (skew)
HOT_SIZE = 100
_QUINT = 5                # max normal cluster size

STREETS = [
    "Berry Street", "Bedford Avenue", "North 3rd Street", "Kent Avenue",
    "Broadway", "Metropolitan Avenue", "Graham Avenue", "Union Avenue",
    "Grand Street", "Stagg Street", "Maspeth Avenue", "Jackson Street",
    "Woodpoint Road", "North 11th Street", "Marcy Avenue", "Ocean Parkway",
    "Flatbush Avenue", "Atlantic Avenue", "Court Street", "Smith Street",
]
CITIES = [("Brooklyn", "NY", ["11211", "11249", "11206", "11230"]),
          ("New York", "NY", ["10001", "10007", "10013"]),
          ("Queens", "NY", ["11101", "11375"]),
          ("Newark", "NJ", ["07101", "07102"])]
HOSTS = ["listings.example.com", "homes.example.org", "rent.example.net",
         "www.apts.example.com", "realty.example.io", "boards.example.dev"]
FILLER = ("spacious sunny apartment near the park with laundry in building "
          "hardwood floors updated kitchen close to subway pets allowed "
          "great light quiet block heat and hot water included broker fee "
          "renovated bathroom elevator doorman roof deck bike storage").split()

CANONICAL_CASES = [
    "85-101 North 3rd Street Brooklyn, NY 11249",
    "3R 112 Bedford Avenue Brooklyn, NY 11211",
    "1H 55 Berry Street Brooklyn, NY 11211",
    "21F 22 NORTH 6 STREET Brooklyn, NY 11249",
    "3Q 60 Broadway Brooklyn, NY 11249",
]

_ABBR = {"Street": "St", "Avenue": "Ave", "Road": "Rd", "Parkway": "Pkwy",
         "North": "N", "Ocean": "Ocean", "Boulevard": "Blvd"}


def _h(*xs: int) -> int:
    """Deterministic 64-bit mix of integers (splitmix64 chain)."""
    acc = 0x9E3779B97F4A7C15
    for x in xs:
        acc = (acc + x) & 0xFFFFFFFFFFFFFFFF
        acc = ((acc ^ (acc >> 30)) * 0xBF58476D1CE4B5B9) & 0xFFFFFFFFFFFFFFFF
        acc = ((acc ^ (acc >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        acc ^= acc >> 31
    return acc


def cluster_of(i: int, seed: int) -> tuple[int, int]:
    """id → (cluster_id, member_rank), statelessly.

    ids < HOT_CLUSTERS*HOT_SIZE form the hot clusters; the rest are
    grouped in quintets whose effective size 1..5 is hashed from the
    quintet index — members past the size become singletons.
    """
    hot_span = HOT_CLUSTERS * HOT_SIZE
    if i < hot_span:
        return i // HOT_SIZE, i % HOT_SIZE
    base = (i - hot_span) // _QUINT
    r = (i - hot_span) % _QUINT
    size = 1 + _h(seed, 101, base) % _QUINT
    cid = HOT_CLUSTERS + base * (_QUINT + 1)
    if r < size:
        return cid, r
    return cid + 1 + r, 0        # singleton cluster


def _entity_address(cid: int, seed: int) -> str:
    """Canonical address string of a cluster's entity."""
    if HOT_CLUSTERS <= cid < HOT_CLUSTERS + len(CANONICAL_CASES) * (_QUINT + 1) \
            and cid % (_QUINT + 1) == HOT_CLUSTERS % (_QUINT + 1):
        case_idx = (cid - HOT_CLUSTERS) // (_QUINT + 1)
        if case_idx < len(CANONICAL_CASES):
            return CANONICAL_CASES[case_idx]
    h = _h(seed, 202, cid)
    # street pool: named streets + generated numbered streets, so the
    # entity address space scales with data size (a small fixed space
    # makes distinct entities collide on full addresses at 10^6+ rows —
    # a generator artifact, not a real-crawl property)
    n_numbered = 180
    street_idx = h % (len(STREETS) + n_numbered)
    if street_idx < len(STREETS):
        street = STREETS[street_idx]
    else:
        k = street_idx - len(STREETS) + 12
        sfx = "th" if 10 <= k % 100 <= 20 else {1: "st", 2: "nd", 3: "rd"}.get(k % 10, "th")
        street = f"East {k}{sfx} Street"
    city_idx = (h >> 8) % len(CITIES)
    city, state, zips = CITIES[city_idx]
    # zip is a function of (street, city): real streets live in one zip,
    # and distinct entities then can't collide on house+street+city with
    # different zips (an undecidable confusable for the reference formulas)
    zipc = zips[_h(seed, 77, street_idx, city_idx) % len(zips)]
    house = 1 + (h >> 24) % 9800
    unit = ""
    if (h >> 40) % 10 < 3:
        unit = f"{1 + (h >> 44) % 20}{chr(ord('A') + (h >> 50) % 6)}"
    addr = f"{house} {street}"
    if unit:
        addr += f" Apt {unit}"
    return f"{addr} {city}, {state} {zipc}"


def _perturb_address(addr: str, rank: int, h: int) -> str:
    """Same-entity format variants: abbreviation swaps, unit-format
    rewrites, case noise — never touching house number or zip digits,
    mirroring how one listing appears across sites."""
    if rank == 0:
        return addr
    out = addr
    if h % 2:
        for full, abbr in _ABBR.items():
            out = out.replace(full, abbr)
    if (h >> 1) % 3 == 0:
        out = out.replace(" Apt ", " #").replace(" apt ", " #")
    elif (h >> 1) % 3 == 1:
        out = out.replace(" Apt ", " Unit ")
    if (h >> 3) % 3 == 0:
        out = out.replace(",", "")
    if (h >> 5) % 4 == 0:
        out = out.upper()
    elif (h >> 5) % 4 == 1:
        out = out.lower()
    return out


def _filler(h: int, n_words: int, perturb: int = 0) -> str:
    words = [FILLER[_h(h, k) % len(FILLER)] for k in range(n_words)]
    if perturb:
        # swap two filler words + typo one (near-dup, not identical)
        p = _h(h, 999, perturb)
        if n_words >= 2:
            a, b = p % n_words, (p >> 8) % n_words
            words[a], words[b] = words[b], words[a]
        w = words[(p >> 16) % n_words]
        if len(w) > 3:
            cut = 1 + (p >> 24) % (len(w) - 2)
            words[(p >> 16) % n_words] = w[:cut] + w[cut + 1:]
    return " ".join(words)


def _row(i: int, seed: int) -> tuple[str, int, bytes, str, str]:
    cid, rank = cluster_of(i, seed)
    h = _h(seed, 303, i)
    addr = _perturb_address(_entity_address(cid, seed), rank, h)
    # cluster-correlated filler → LSH co-blocking for near-dup text
    fill = _filler(_h(seed, 404, cid), 14 + h % 6, perturb=rank)
    text = f"For rent: {addr}. {fill.capitalize()}."

    host = HOSTS[_h(seed, 505, cid, rank // 3) % len(HOSTS)]
    path = f"/listing/{cid}-{_h(seed, 606, cid) % 99999}"
    scheme = "https" if (h >> 9) % 4 else "http"
    url = f"{scheme}://{host}{path}"
    deco = (h >> 11) % 5
    if deco == 1:
        url += "/"
    elif deco == 2:
        url += "?utm_source=feed&utm_campaign=x"
    elif deco == 3 and not host.startswith("www."):
        url = f"{scheme}://www.{host}{path}"
    elif deco == 4:
        url += f"?ref={h % 97}"
    # monotone-per-host seeded timestamp (µs since 2021-01-01)
    warc_ts = 1609459200_000000 + i * 60_000_000 + h % 1_000_000

    title = f"Listing {cid}" if rank else f"Home {cid}"
    html = (f"<html><head><title>{title}</title>"
            f"<script>var t={h % 1000};track(t);</script>"
            f"<style>.x{{color:red}}</style></head>"
            f"<body><nav><a href=\"/\">Home</a> | <a href=\"/search\">Search</a></nav>"
            f"<div id=\"main\"><p>{text}</p></div>"
            f"<footer>&copy; example {2020 + h % 5} &amp; partners</footer>"
            f"</body></html>").encode()
    lang = "en" if h % 20 else "de"
    return url, warc_ts, html, text, lang


def pages_batch(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Arrow table of pages for a batch of row ids (stateless)."""
    rows = [_row(int(i), seed) for i in ids]
    urls, ts, htmls, texts, langs = zip(*rows) if rows else ((),) * 5
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(list(ts), pa.timestamp("us")),
        "html": pa.array(list(htmls), pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "doc_id": pa.array([int(i) for i in ids], pa.uint64()),
    })


def truth_batch(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Ground-truth clusters (FIXTURES.md F4)."""
    cids = [cluster_of(int(i), seed)[0] for i in ids]
    return pa.table({
        "doc_id": pa.array([int(i) for i in ids], pa.uint64()),
        "cluster_id": pa.array(cids, pa.uint64()),
    })


def synth_pages(n: int, seed: int = 42, parallelism: int = -1):
    """Streaming pages Dataset — ``range(n)`` then stateless map_batches."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(
        lambda b: pages_batch(b["id"], seed), batch_format="numpy",
        batch_size=4096)


def synth_truth(n: int, seed: int = 42):
    import ray.data as rd

    ds = rd.range(n)
    return ds.map_batches(lambda b: truth_batch(b["id"], seed),
                          batch_format="numpy", batch_size=8192)
