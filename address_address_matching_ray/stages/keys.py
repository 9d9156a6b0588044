"""Blocking-key derivation — the candidate-generation flat-map.

Replaces the reference's per-query search-service retrieval (SURVEY
§2.4 J1/J2: ``optimized.py:541-615`` query builder, U:1354-1459 direct
lookups) with locality-sensitive blocking keys feeding ONE groupby
shuffle.  Each record fans out to at most a handful of key rows
(bounded like the reference's variant caps, SURVEY §2.7 K3):

    u:…       canonicalized URL (same page re-crawled / tracked)
    e:…       exact normalized full-address string (tier-0 short-circuit,
              J2's exact composite lookup)
    h:…       house|street-name|zip composite (recall across
              unit/type format variants — the M15 variant fan-out
              collapsed into one canonical key)
    s:…       house|soundex(street)|state phonetic key (M4 / the
              phonetic tier's retrieval idea)
    b{i}:…    MinHash-LSH band keys over extracted-text shingles
              (near-dup text; bands/rows from config)

Stateful stage: the MinHash permutation matrix is built once per actor
(``KeyDeriver.__init__``) — SURVEY §2.3 ST3 analog.

Key rows carry the slim scoring payload (8 short strings) so pair
generation needs no second join against the docs table; the wide
``html``/``extracted_text`` columns never enter the shuffle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from address_address_matching_ray.config import PipelineConfig
from address_address_matching_ray.functions.minhash import MinHasher, shingles
from address_address_matching_ray.functions.normalize import (
    normalize_array, phonetic_code,
)

_SCHEME_RE = re.compile(r"^[a-z][a-z0-9+.-]*://", re.I)
_TRACKING_PARAM_RE = re.compile(r"^(utm_[a-z]+|ref|fbclid|gclid|mc_cid|mc_eid)$", re.I)

PAYLOAD_COLS = ("norm_addr", "house", "street_name", "street_type",
                "unit", "city", "state", "zip")


def canonical_url(url: str) -> str:
    """Deterministic URL canonicalization: drop scheme, leading ``www.``,
    trailing ``/``, tracking query params; sort surviving params."""
    if not url:
        return ""
    u = _SCHEME_RE.sub("", url.strip())
    if "#" in u:
        u = u.split("#", 1)[0]
    query = ""
    if "?" in u:
        u, query = u.split("?", 1)
    host, _, path = u.partition("/")
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    path = "/" + path
    while path.endswith("/") and len(path) > 1:
        path = path[:-1]
    kept = []
    if query:
        for part in query.split("&"):
            k = part.split("=", 1)[0]
            if k and not _TRACKING_PARAM_RE.match(k):
                kept.append(part)
    if kept:
        return f"{host}{path}?{'&'.join(sorted(kept))}"
    return f"{host}{path}"


class KeyDeriver:
    """Actor-pool stage: extracted → keys (one row per (doc, key))."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.minhasher = MinHasher(self.cfg.minhash_perms, self.cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        payload = {c: batch[c].to_pandas().fillna("").to_numpy(dtype=object)
                   for c in PAYLOAD_COLS}
        urls = batch["url"].to_pandas().fillna("").to_numpy(dtype=object)
        texts = batch["extracted_text"].to_pandas().fillna("").to_numpy(dtype=object)

        street_norm = normalize_array(payload["street_name"])

        out_row: list[int] = []
        out_key: list[str] = []
        out_kind: list[str] = []

        def emit(i: int, key: str, kind: str) -> None:
            out_row.append(i)
            out_key.append(key)
            out_kind.append(kind)

        # LSH bands over extracted-text token shingles (batched)
        toks = [shingles(t.lower().split(), cfg.shingle_size) for t in texts]
        sigs = self.minhasher.batch_signatures(toks)
        from address_address_matching_ray.functions.minhash import lsh_band_keys
        band_keys = lsh_band_keys(sigs, cfg.lsh_bands)

        for i in range(n):
            cu = canonical_url(urls[i])
            if cu:
                emit(i, f"u:{cu}", "url_canon")
            na = payload["norm_addr"][i]
            if na:
                emit(i, f"e:{na}", "exact")
            house, sname, zipc = payload["house"][i], street_norm[i], payload["zip"][i]
            state = payload["state"][i]
            if house and sname:
                emit(i, f"h:{house}|{sname}|{zipc}", "composite")
                emit(i, f"s:{house}|{phonetic_code(sname)}|{state.upper()}", "phonetic")
            if toks[i]:
                for bk in band_keys[i]:
                    emit(i, bk, "lsh_band")

        row_of = np.asarray(out_row, dtype=np.int64)
        cols = {"doc_id": pa.array(doc_id[row_of], pa.uint64()),
                "block_key": pa.array(out_key, pa.string()),
                "key_kind": pa.array(out_kind, pa.string())}
        for c in PAYLOAD_COLS:
            cols[c] = pa.array(payload[c][row_of] if len(row_of) else [], pa.string())
        return pa.table(cols)


# per-worker-process cache: stateless tasks reuse Ray's already-warm
# default workers (no per-stage actor process spawn — that fixed cost
# dominated small runs), while the derivation state (permutation
# matrices, compiled tables) is still built once per worker, keyed by
# config fingerprint.
_DERIVER_CACHE: dict[str, KeyDeriver] = {}


def _derive_task(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    fp = cfg.fingerprint()
    deriver = _DERIVER_CACHE.get(fp)
    if deriver is None:
        deriver = KeyDeriver(cfg)
        _DERIVER_CACHE[fp] = deriver
    return deriver(batch)


def keys_stage(extracted, cfg: PipelineConfig | None = None,
               concurrency: int | tuple | None = None, batch_size: int = 2048,
               use_actor_pool: bool = False):
    """extracted → keys.  Default: stateless tasks + per-worker cache
    (state is small, so the warm task pool beats spawning an actor pool).
    ``use_actor_pool=True`` switches to an autoscaling actor pool — the
    right shape when derivation state becomes heavy (e.g. a model)."""
    cfg = cfg or PipelineConfig()
    schema_names = extracted.schema().names
    if "reject_reason" in schema_names:
        # rows failing the require-filters never enter the shuffle (M18)
        extracted = extracted.filter(expr='reject_reason == ""')
    if use_actor_pool:
        return extracted.map_batches(
            KeyDeriver, fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency or (1, 32))
    return extracted.map_batches(
        _derive_task, fn_kwargs={"cfg": cfg},
        batch_format="pyarrow", batch_size=batch_size)
