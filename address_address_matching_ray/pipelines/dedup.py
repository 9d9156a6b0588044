"""Deduplication operators over a documents table (training-data ops).

Each variant is Ray-Data-first and shares the blocking machinery of the
linkage pipeline (hash-partitioned groupby; no driver-side loops):

- ``exact_dedup``        hash-partition on normalized text → keep the
                         min-doc_id representative per group
- ``minhash_dedup``      shingle → MinHash → LSH band keys → bucketed
                         groupby → verified token-Jaccard → connected
                         components → representatives
- ``simhash_dedup``      64-bit SimHash, band-sliced blocking, Hamming
                         verification
- ``ngram_jaccard_dedup`` character-n-gram Jaccard verification on
                         LSH candidates (recall path for short texts)

All decisions are deterministic (representative = min doc_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from address_address_matching_ray.config import PipelineConfig
from address_address_matching_ray.functions.fuzzy import jaccard
from address_address_matching_ray.functions.minhash import (
    MinHasher, SimHasher, hamming_distance, lsh_band_keys, shingles,
    simhash_band_keys,
)
from address_address_matching_ray.functions.textstats import char_ngrams
from address_address_matching_ray.stages.cluster import (
    connected_components, filter_out_ids,
)


def _norm_text(s: pd.Series) -> pd.Series:
    return s.fillna("").str.lower().str.split().str.join(" ")


def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                buckets: int = 64):
    """One representative row (min id) per distinct normalized text.

    Bucketed shuffle (``hash(norm) % B``) with ONE vectorized pandas
    dedup per bucket — a per-distinct-text ``map_groups`` would pay a
    Python call per tiny group, the wrong shape at 10^12 rows.
    """
    def add_bucket(df: pd.DataFrame) -> "pa.Table":
        # Arrow out: the groupby shuffle moves compact string buffers
        import pyarrow as pa

        norm = _norm_text(df[text_col])
        h = pd.util.hash_array(norm.to_numpy(dtype=object))
        out = pa.Table.from_pandas(df, preserve_index=False) \
                      .replace_schema_metadata(None)
        out = out.append_column("_norm", pa.array(norm, pa.string()))
        return out.append_column(
            "_bucket", pa.array((h % np.uint64(buckets)).astype("int64")))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([("_norm"), (id_col)], kind="mergesort")
        counts = g.groupby("_norm", sort=False)[id_col].transform("size")
        g = g.assign(n_dups=counts.astype("int64"))
        g = g.drop_duplicates("_norm", keep="first")
        return g.drop(columns=["_norm", "_bucket"]).reset_index(drop=True)

    return (docs_ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(dedup_bucket, batch_format="pandas"))


class _NearDupKeyer:
    """Stateful keyer: doc → candidate band keys (minhash or simhash).
    Run via ``_keyer_task`` (stateless tasks + per-worker cache — the
    sketch state is small, and spawning an actor pool paid ~5 s fixed
    per call at bench scale); the class remains usable as an actor-pool
    stage for heavy-state variants."""

    def __init__(self, mode: str, cfg: PipelineConfig,
                 text_col: str, id_col: str):
        self.mode = mode
        self.cfg = cfg
        self.text_col = text_col
        self.id_col = id_col
        self.minhasher = MinHasher(cfg.dedup_minhash_perms, cfg.seed)
        self.simhasher = SimHasher(cfg.simhash_bits, cfg.seed)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from address_address_matching_ray.functions.minhash import (
            band_key_strings, lsh_band_digests,
        )

        n = len(df)
        toks = [t.lower().split() for t in df[self.text_col].fillna("")]
        ids = df[self.id_col].to_numpy(dtype="uint64")
        texts = _norm_text(df[self.text_col]).to_numpy(dtype=object)
        if self.mode == "minhash":
            sh = [shingles(t, self.cfg.shingle_size) for t in toks]
            sigs = self.minhasher.batch_signatures(sh)
            bands = self.cfg.dedup_lsh_bands
            keys_flat = band_key_strings(lsh_band_digests(sigs, bands))
            sig_col = np.zeros(n, dtype="uint64")
        else:
            sigs = self.simhasher.batch_signatures(toks)
            bands = 4
            keys_flat = np.array(
                [k for ks in simhash_band_keys(sigs, bands) for k in ks],
                dtype=object)
            sig_col = sigs
        # flat (doc × band) emission, no per-row loop
        rows = np.repeat(np.arange(n, dtype=np.int64), bands)
        return pd.DataFrame({
            "doc_id": ids[rows],
            "band_key": keys_flat,
            "norm_text": texts[rows],
            "simhash": sig_col[rows],
        })


class _BandCaps:
    """Cap spec for degenerate (boilerplate) bands, consumed by
    ``pairs_for_groups``: oversized bands are WINDOW-paired with star
    edges to the band minimum (connectivity preserved) and the dropped
    pair count is emitted per row — not silently skipped."""

    max_block_size = 500
    max_pairs_per_block = 20_000



_KEYER_CACHE: dict[tuple, _NearDupKeyer] = {}


def _keyer_task(df: pd.DataFrame, mode: str, cfg: PipelineConfig,
                text_col: str, id_col: str) -> pd.DataFrame:
    key = (mode, cfg.fingerprint(), text_col, id_col)
    keyer = _KEYER_CACHE.get(key)
    if keyer is None:
        keyer = _NearDupKeyer(mode, cfg, text_col, id_col)
        _KEYER_CACHE[key] = keyer
    return keyer(df)


def _candidate_pairs(keyed_ds, buckets: int = 32):
    """band-keyed rows → unique candidate id pairs (bucketed shuffle,
    same pattern as stages/pairs.py; oversized bands windowed with
    logged drops via ``pairs_for_groups``)."""
    from address_address_matching_ray.stages.pairs import pairs_for_groups

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_array(df["band_key"].to_numpy(dtype=object))
        df["bucket"] = (h % np.uint64(buckets)).astype("int64")
        return df

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["band_key", "doc_id"])
                .drop_duplicates(["band_key", "doc_id"]).reset_index(drop=True))
        keys = df["band_key"].to_numpy(dtype=object)
        starts = np.flatnonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))
        ends = np.concatenate([starts[1:], [len(df)]])
        sizes = ends - starts
        multi = sizes >= 2
        empty = pd.DataFrame({
            "left_id": pd.array([], dtype="uint64"),
            "right_id": pd.array([], dtype="uint64"),
            "l_text": pd.Series(dtype="object"),
            "r_text": pd.Series(dtype="object"),
            "l_sig": pd.array([], dtype="uint64"),
            "r_sig": pd.array([], dtype="uint64"),
            "dropped_pairs": pd.array([], dtype="uint64")})
        if not multi.any():
            return empty
        gl, gr, _own, _sp, dp = pairs_for_groups(
            starts[multi], sizes[multi], _BandCaps)
        if not len(gl):
            return empty
        ids = df["doc_id"].to_numpy(dtype="uint64")
        texts = df["norm_text"].to_numpy(dtype=object)
        sigs = df["simhash"].to_numpy(dtype="uint64")
        out = pd.DataFrame({
            "left_id": ids[gl], "right_id": ids[gr],
            "l_text": texts[gl], "r_text": texts[gr],
            "l_sig": sigs[gl], "r_sig": sigs[gr],
            "dropped_pairs": dp})
        return out.drop_duplicates(["left_id", "right_id"]).reset_index(drop=True)

    return (keyed_ds.map_batches(bucket, batch_format="pandas")
            .groupby("bucket").map_groups(
                lambda g: pairs(g.drop(columns=["bucket"])),
                batch_format="pandas"))


def _dedup_from_edges(docs_ds, edges_ds, id_col: str = "doc_id",
                      broadcast_threshold: int = 5_000_000):
    """edges → components → drop non-representative members via the
    scale-safe left-anti semi-join (``filter_out_ids``: sorted-array
    broadcast below threshold, hash anti-join above — NEVER a Python
    set on the driver; near-dup-heavy crawls make that set O(corpus))."""
    labels = connected_components(edges_ds.materialize())
    dupe_ids = labels.filter(expr="doc_id != cluster_id") \
                     .select_columns(["doc_id"])
    return filter_out_ids(docs_ds, dupe_ids, id_col=id_col,
                          ids_col="doc_id",
                          broadcast_threshold=broadcast_threshold)


def minhash_dedup(docs_ds, cfg: PipelineConfig | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  jaccard_threshold: float = 70.0, buckets: int = 32,
                  broadcast_threshold: int = 5_000_000):
    """MinHash-LSH near-dup removal (Broder-style): keep min-id
    representative of every near-dup component."""
    cfg = cfg or PipelineConfig()
    keyed = docs_ds.map_batches(
        _keyer_task, fn_kwargs={
            "mode": "minhash", "cfg": cfg, "text_col": text_col,
            "id_col": id_col},
        batch_format="pandas")
    cand = _candidate_pairs(keyed, buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["left_id", "right_id"]]
        sims = np.fromiter(
            (jaccard(a.split(), b.split())
             for a, b in zip(df["l_text"], df["r_text"])),
            dtype=np.float64, count=len(df))
        return df.loc[sims >= jaccard_threshold, ["left_id", "right_id"]]

    edges = cand.map_batches(verify, batch_format="pandas")
    return _dedup_from_edges(docs_ds, edges, id_col,
                             broadcast_threshold=broadcast_threshold)


def simhash_dedup(docs_ds, cfg: PipelineConfig | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, buckets: int = 32,
                  broadcast_threshold: int = 5_000_000):
    """SimHash near-dup removal: band-sliced blocking + Hamming verify."""
    cfg = cfg or PipelineConfig()
    keyed = docs_ds.map_batches(
        _keyer_task, fn_kwargs={
            "mode": "simhash", "cfg": cfg, "text_col": text_col,
            "id_col": id_col},
        batch_format="pandas")
    cand = _candidate_pairs(keyed, buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["left_id", "right_id"]]
        d = hamming_distance(df["l_sig"].to_numpy(dtype="uint64"),
                             df["r_sig"].to_numpy(dtype="uint64"))
        return df.loc[d <= max_hamming, ["left_id", "right_id"]]

    edges = cand.map_batches(verify, batch_format="pandas")
    return _dedup_from_edges(docs_ds, edges, id_col,
                             broadcast_threshold=broadcast_threshold)


def ngram_jaccard_dedup(docs_ds, cfg: PipelineConfig | None = None,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 5, threshold: float = 60.0,
                        buckets: int = 32,
                        broadcast_threshold: int = 5_000_000):
    """Character-n-gram Jaccard near-dup removal (LSH candidates,
    n-gram-set verification — robust for short/typo-heavy texts)."""
    cfg = cfg or PipelineConfig()
    keyed = docs_ds.map_batches(
        _keyer_task, fn_kwargs={
            "mode": "minhash", "cfg": cfg, "text_col": text_col,
            "id_col": id_col},
        batch_format="pandas")
    cand = _candidate_pairs(keyed, buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["left_id", "right_id"]]
        sims = np.fromiter(
            (jaccard(char_ngrams(a, n), char_ngrams(b, n))
             for a, b in zip(df["l_text"], df["r_text"])),
            dtype=np.float64, count=len(df))
        return df.loc[sims >= threshold, ["left_id", "right_id"]]

    edges = cand.map_batches(verify, batch_format="pandas")
    return _dedup_from_edges(docs_ds, edges, id_col,
                             broadcast_threshold=broadcast_threshold)
