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

Shuffle-width discipline (the 100-TB constraint): the blocking shuffle
carries ONLY ``(doc_id, band_key[, sig])`` — 8-byte ids and 8-byte
mixed-uint64 band keys (``mix_band_keys_u64``), never document text.
Replicating ``norm_text`` once per LSH band row (the round-2 shape)
made the keyed exchange ≥17× the corpus bytes at 16 bands; slim rows
are a FIXED 16 B/band-row regardless of doc length (on KB-scale
webtext the ratio falls far below 1).  Verification text is attached
AFTER blocking (``_pair_texts``): candidate pairs are globally deduped
(LSH emits each pair once per agreeing band), then below the broadcast
threshold the probed-id-filtered texts are broadcast once and attached
with vectorized ``searchsorted`` lookups (zero shuffles); above it one
union-groupby join ships the corpus text across the wire exactly once.
SimHash needs no text at all — Hamming verification reads the two
64-bit signatures carried with the band rows.

All decisions are deterministic (representative = min doc_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from address_address_matching_ray.config import PipelineConfig
from address_address_matching_ray.functions.fuzzy import jaccard
from address_address_matching_ray.functions.minhash import (
    MinHasher, SimHasher, batch_set_jaccard, hamming_distance, shingles,
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
    """Stateful keyer: doc → slim candidate band rows (minhash or
    simhash): ``(doc_id, band_key)`` plus the 64-bit signature for
    simhash (Hamming verify reads it; minhash rows carry no sig — text
    verification happens post-join).  Run via ``_keyer_task`` (stateless
    tasks + per-worker cache — the sketch state is small, and spawning
    an actor pool paid ~5 s fixed per call at bench scale); the class
    remains usable as an actor-pool stage for heavy-state variants."""

    def __init__(self, mode: str, cfg: PipelineConfig,
                 text_col: str, id_col: str):
        self.mode = mode
        self.cfg = cfg
        self.text_col = text_col
        self.id_col = id_col
        self.minhasher = MinHasher(cfg.dedup_minhash_perms, cfg.seed)
        self.simhasher = SimHasher(cfg.simhash_bits, cfg.seed)

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        from address_address_matching_ray.functions.minhash import (
            lsh_band_digests, mix_band_keys_u64,
        )

        n = len(df)
        toks = [t.lower().split() for t in df[self.text_col].fillna("")]
        ids = df[self.id_col].to_numpy(dtype="uint64")
        if self.mode == "minhash":
            sh = [shingles(t, self.cfg.shingle_size) for t in toks]
            sigs = self.minhasher.batch_signatures(sh)
            bands = self.cfg.dedup_lsh_bands
            keys = mix_band_keys_u64(lsh_band_digests(sigs, bands))
            rows = np.repeat(np.arange(n, dtype=np.int64), bands)
            return pa.table({
                "doc_id": pa.array(ids[rows], pa.uint64()),
                "band_key": pa.array(keys.ravel(), pa.uint64())})
        # simhash: band slices of the 64-bit signature → numeric keys
        sigs = self.simhasher.batch_signatures(toks)
        bands = 4
        width = 64 // bands
        mask = np.uint64((1 << width) - 1)
        slices = np.stack([(sigs >> np.uint64(j * width)) & mask
                           for j in range(bands)], axis=1)
        keys = mix_band_keys_u64(slices)
        rows = np.repeat(np.arange(n, dtype=np.int64), bands)
        return pa.table({
            "doc_id": pa.array(ids[rows], pa.uint64()),
            "band_key": pa.array(keys.ravel(), pa.uint64()),
            "sig": pa.array(sigs[rows], pa.uint64())})


class _BandCaps:
    """Cap spec for degenerate (boilerplate) bands, consumed by
    ``pairs_for_groups``: oversized bands are WINDOW-paired with star
    edges to the band minimum (connectivity preserved) and the dropped
    pair count is emitted per row — not silently skipped."""

    max_block_size = 500
    max_pairs_per_block = 20_000



_KEYER_CACHE: dict[tuple, _NearDupKeyer] = {}


def _keyer_task(df: pd.DataFrame, mode: str, cfg: PipelineConfig,
                text_col: str, id_col: str) -> pa.Table:
    key = (mode, cfg.fingerprint(), text_col, id_col)
    keyer = _KEYER_CACHE.get(key)
    if keyer is None:
        keyer = _NearDupKeyer(mode, cfg, text_col, id_col)
        _KEYER_CACHE[key] = keyer
    return keyer(df)


def _candidate_pairs(keyed_ds, buckets: int = 32, carry_sig: bool = False):
    """Slim band rows → unique candidate id pairs (bucketed shuffle,
    same pattern as stages/pairs.py; oversized bands windowed with
    logged drops via ``pairs_for_groups``).  Arrow end-to-end — the
    exchange moves only ids + 20-byte keys (+ 8-byte sigs when
    ``carry_sig``)."""
    from address_address_matching_ray.stages.pairs import pairs_for_groups

    def bucket(t: pa.Table) -> pa.Table:
        keys = t["band_key"].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(keys)
        return t.append_column(
            "bucket", pa.array((h % np.uint64(buckets)).astype("int64")))

    def _empty() -> pa.Table:
        cols = {"left_id": pa.array([], pa.uint64()),
                "right_id": pa.array([], pa.uint64()),
                "dropped_pairs": pa.array([], pa.uint64())}
        if carry_sig:
            cols["l_sig"] = pa.array([], pa.uint64())
            cols["r_sig"] = pa.array([], pa.uint64())
        return pa.table(cols)

    def pairs(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["bucket"]).sort_by(
            [("band_key", "ascending"), ("doc_id", "ascending")])
        keys = t["band_key"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
        if len(keys) == 0:
            return _empty()
        # dedup (band_key, doc_id) rows — same doc can hit a band twice
        same = np.concatenate(
            [[False], (keys[1:] == keys[:-1]) & (ids[1:] == ids[:-1])])
        if same.any():
            keep = ~same
            keys, ids = keys[keep], ids[keep]
            t = t.filter(pa.array(keep))
        starts = np.flatnonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))
        ends = np.concatenate([starts[1:], [len(keys)]])
        sizes = ends - starts
        multi = sizes >= 2
        if not multi.any():
            return _empty()
        gl, gr, _own, _sp, dp = pairs_for_groups(
            starts[multi], sizes[multi], _BandCaps)
        if not len(gl):
            return _empty()
        cols = {"left_id": pa.array(ids[gl], pa.uint64()),
                "right_id": pa.array(ids[gr], pa.uint64()),
                "dropped_pairs": pa.array(dp, pa.uint64())}
        if carry_sig:
            sigs = t["sig"].to_numpy(zero_copy_only=False).astype("uint64")
            cols["l_sig"] = pa.array(sigs[gl], pa.uint64())
            cols["r_sig"] = pa.array(sigs[gr], pa.uint64())
        out = pa.table(cols)
        # in-bucket pair dedup (several bands of the same pair often
        # share a bucket); cross-bucket duplicates are harmless to the
        # downstream connected components
        df = out.to_pandas().drop_duplicates(["left_id", "right_id"])
        return pa.Table.from_pandas(df, preserve_index=False) \
                       .replace_schema_metadata(None)

    return (keyed_ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(pairs, batch_format="pyarrow"))


def _slim_texts(docs_ds, text_col: str, id_col: str):
    """docs → Arrow ``(doc_id uint64, norm_text)`` — the join side."""
    def f(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(df[id_col].to_numpy(dtype="uint64"),
                               pa.uint64()),
            "norm_text": pa.array(_norm_text(df[text_col]), pa.string())})

    return docs_ds.map_batches(f, batch_format="pandas")


def _dedup_cand_pairs(cand_ds, buckets: int = 32):
    """Global (left_id, right_id) dedup of candidate pairs.  LSH emits
    the same pair once per agreeing band, and band-hash bucketing
    scatters those copies across buckets where the in-bucket dedup
    can't see them — measured ~10× duplication at 16 bands on a
    near-dup-heavy corpus.  One bucketed shuffle of the slim 24-B pair
    rows collapses them BEFORE the pairs are exploded against the text
    table; ``dropped_pairs`` keeps the max across copies (each band
    logged its own window drops — max is the conservative survivor)."""
    def add_b(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (t["left_id"].to_numpy(zero_copy_only=False).astype("uint64")
                 * np.uint64(0x9E3779B97F4A7C15)
                 ^ t["right_id"].to_numpy(zero_copy_only=False).astype("uint64"))
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    def dd(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_b"]).sort_by(
            [("left_id", "ascending"), ("right_id", "ascending"),
             ("dropped_pairs", "descending")])
        l = t["left_id"].to_numpy(zero_copy_only=False)
        r = t["right_id"].to_numpy(zero_copy_only=False)
        if len(l) < 2:
            return t
        keep = np.concatenate([[True], (l[1:] != l[:-1]) | (r[1:] != r[:-1])])
        return t.filter(pa.array(keep)) if not keep.all() else t

    return (cand_ds.map_batches(add_b, batch_format="pyarrow")
            .groupby("_b").map_groups(dd, batch_format="pyarrow"))


def _pair_texts(cand_ds, texts_ds, buckets: int = 32,
                probe_broadcast_threshold: int = 16_000_000,
                text_broadcast_bytes: int = 1 << 30):
    """Attach ``l_text``/``r_text`` to candidate id pairs.

    Pairs arrive globally duplicated — LSH emits each pair once per
    agreeing band and band-hash bucketing scatters the copies across
    buckets (~10× duplication at 16 bands) — so they are deduped first.

    **Broadcast path** (raw pair count ≤ threshold — the common case on
    a near-dup-sparse corpus, same discipline as ``filter_out_ids``;
    the 16M default bounds the driver pull at ≤384 MB of 24-B pair
    rows, and probed-TEXT bytes are gated separately by
    ``text_broadcast_bytes``):
    dedup the slim 24-B pair rows on the driver in one vectorized pass,
    filter the text table to probed doc_ids with one sorted-array
    membership test per batch, pull ONLY those texts, broadcast the
    sorted ``(ids, texts)`` arrays once via ``ray.put``, and attach both
    sides in a single ``map_batches`` over the pairs with two
    ``searchsorted`` lookups — zero shuffles.

    **Shuffle path** (huge candidate sets): pairs are deduped by a
    bucketed shuffle (``_dedup_cand_pairs``), then explode to
    ``(left_id, right_id, side, probe_id)`` rows and UNION with the
    slim text table (tagged ``side = -1``); bucketing by
    ``hash(probe_id)`` co-locates each doc's text with every pair-side
    probing it (the corpus text crosses the wire once), then matched
    pair-sides pivot back to pair-per-row via a pair-hash bucketed
    groupby.  No ``Dataset.join`` — its hash-shuffle actor machinery
    costs seconds of fixed overhead that dwarfs small candidate sets.
    """
    import ray

    cand_ds = cand_ds.materialize()
    raw_pairs = cand_ds.count()

    def _empty_out() -> pa.Table:
        return pa.table({
            "left_id": pa.array([], pa.uint64()),
            "right_id": pa.array([], pa.uint64()),
            "dropped_pairs": pa.array([], pa.uint64()),
            "l_text": pa.array([], pa.string()),
            "r_text": pa.array([], pa.string())})

    if raw_pairs == 0:
        return cand_ds.map_batches(lambda t: _empty_out(),
                                   batch_format="pyarrow")

    if 2 * raw_pairs <= probe_broadcast_threshold:
        # broadcast path: the raw (duplicated) pair table is slim
        # (24 B/row) and bounded by the threshold, so dedup it on the
        # driver in one numpy lexsort pass over zero-copy Arrow block
        # pulls — skipping the pair-dedup shuffle entirely (a Ray
        # groupby costs seconds of fixed latency regardless of size)
        blocks = [b for b in ray.get(cand_ds.to_arrow_refs())
                  if b.num_rows]
        t = pa.concat_tables(blocks).combine_chunks()
        l = t["left_id"].to_numpy(zero_copy_only=False).astype("uint64")
        r = t["right_id"].to_numpy(zero_copy_only=False).astype("uint64")
        dp = t["dropped_pairs"].to_numpy(
            zero_copy_only=False).astype("uint64")
        # one radix argsort on a combined pair hash instead of a 3-key
        # lexsort (3× the passes); a 2⁻⁶⁴ hash collision at worst keeps
        # one duplicate edge, which verification/CC absorb unchanged
        with np.errstate(over="ignore"):
            c = l * np.uint64(0x9E3779B97F4A7C15) ^ r
        order = np.argsort(c, kind="stable")
        l, r, dp, c = l[order], r[order], dp[order], c[order]
        keep = np.concatenate(
            [[True], (l[1:] != l[:-1]) | (r[1:] != r[:-1])])
        # max dropped_pairs across equal-(l,r) runs — the shuffle path
        # (_dedup_cand_pairs) keeps the max as the conservative
        # survivor, and both paths must report identical stats
        dp = np.maximum.reduceat(dp, np.flatnonzero(keep))
        l, r = l[keep], r[keep]
        probe_ids = np.unique(np.concatenate([l, r]))
        ref = ray.put(probe_ids)

        def keep_probed(t: pa.Table) -> pa.Table:
            k = ray.get(ref)
            v = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
            pos = np.minimum(np.searchsorted(k, v), len(k) - 1)
            return t.filter(pa.array(k[pos] == v))

        import ray.data as _rd
        pairs_tbl = pa.table({
            "left_id": pa.array(l, pa.uint64()),
            "right_id": pa.array(r, pa.uint64()),
            "dropped_pairs": pa.array(dp, pa.uint64())})
        tf_ds = texts_ds.map_batches(keep_probed,
                                     batch_format="pyarrow").materialize()
        if tf_ds.size_bytes() > text_broadcast_bytes:
            # pair COUNT fit the broadcast bar but the probed TEXT
            # bytes don't (KB-scale webtext × millions of probed ids =
            # multi-GB driver pull) — fall through to the shuffle
            # attach, reusing the driver-deduped pairs and the
            # already-filtered text table (both strictly smaller)
            return _shuffle_attach(_rd.from_arrow(pairs_tbl), tf_ds,
                                   buckets)
        tf = tf_ds.to_pandas()
        tids = tf["doc_id"].to_numpy(dtype="uint64")
        order = np.argsort(tids, kind="stable")
        text_ref = ray.put((tids[order],
                            tf["norm_text"].to_numpy(dtype=object)[order]))

        def attach_pairs(t: pa.Table) -> pa.Table:
            # worker-cached: the (ids, OBJECT-array-of-texts) tuple is
            # pickled, not zero-copy — a bare ray.get per batch
            # re-deserialized 300k strings every 1024 rows (round-4
            # regression hunt: minutes of pure unpickling)
            from address_address_matching_ray.stages.bcast import get_cached
            k, txt = get_cached(text_ref)
            if len(k) == 0 or t.num_rows == 0:
                return _empty_out()
            l = t["left_id"].to_numpy(zero_copy_only=False).astype("uint64")
            r = t["right_id"].to_numpy(zero_copy_only=False).astype("uint64")
            dp = t["dropped_pairs"].to_numpy(
                zero_copy_only=False).astype("uint64")
            lp = np.minimum(np.searchsorted(k, l), len(k) - 1)
            rp = np.minimum(np.searchsorted(k, r), len(k) - 1)
            m = (k[lp] == l) & (k[rp] == r)
            return pa.table({
                "left_id": pa.array(l[m], pa.uint64()),
                "right_id": pa.array(r[m], pa.uint64()),
                "dropped_pairs": pa.array(dp[m], pa.uint64()),
                "l_text": pa.array(txt[lp[m]], pa.string()),
                "r_text": pa.array(txt[rp[m]], pa.string())})

        # split the deduped pair table into many driver-side slices —
        # ONE Arrow table would become ONE block and serialize the
        # whole attach+verify chain into a single task (round-4 hunt:
        # the 1M-doc ngram verify ran serially for minutes)
        nrows = pairs_tbl.num_rows
        step = max(4096, -(-nrows // 64))
        slices = [pairs_tbl.slice(s, step) for s in range(0, nrows, step)]
        return _rd.from_arrow(slices).map_batches(
            attach_pairs, batch_format="pyarrow", batch_size=None)

    return _shuffle_attach(_dedup_cand_pairs(cand_ds, buckets), texts_ds,
                           buckets)


def _shuffle_attach(cand_ds, texts_ds, buckets: int):
    """Shuffle path of ``_pair_texts`` (see its docstring): explode
    deduped pairs to per-side probe rows, union with the slim text
    table, bucket by ``hash(probe_id)`` to co-locate, pivot back to
    pair-per-row by pair-hash buckets."""
    def explode(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy(zero_copy_only=False).astype("uint64")
        r = t["right_id"].to_numpy(zero_copy_only=False).astype("uint64")
        dp = t["dropped_pairs"].to_numpy(zero_copy_only=False).astype("uint64")
        n = len(l)
        probe = np.column_stack([l, r]).ravel()
        h = probe * np.uint64(0x9E3779B97F4A7C15)
        return pa.table({
            "left_id": pa.array(np.repeat(l, 2), pa.uint64()),
            "right_id": pa.array(np.repeat(r, 2), pa.uint64()),
            "dropped_pairs": pa.array(np.repeat(dp, 2), pa.uint64()),
            "side": pa.array(np.tile(np.array([0, 1], dtype=np.int64), n)),
            "probe_id": pa.array(probe, pa.uint64()),
            "norm_text": pa.array([""] * (2 * n), pa.string()),
            "_db": pa.array((h % np.uint64(buckets)).astype("int64"))})

    def tag_texts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
        h = ids * np.uint64(0x9E3779B97F4A7C15)
        z = np.zeros(len(ids), dtype="uint64")
        return pa.table({
            "left_id": pa.array(z, pa.uint64()),
            "right_id": pa.array(z, pa.uint64()),
            "dropped_pairs": pa.array(z, pa.uint64()),
            "side": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            "probe_id": pa.array(ids, pa.uint64()),
            "norm_text": t["norm_text"],
            "_db": pa.array((h % np.uint64(buckets)).astype("int64"))})

    with np.errstate(over="ignore"):
        both = (cand_ds.map_batches(explode, batch_format="pyarrow")
                .union(texts_ds.map_batches(tag_texts,
                                            batch_format="pyarrow")))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        is_text = g["side"] == -1
        lookup = pd.Series(
            g.loc[is_text, "norm_text"].to_numpy(dtype=object),
            index=g.loc[is_text, "probe_id"].to_numpy(dtype="uint64"))
        lookup = lookup[~lookup.index.duplicated()]
        out = g.loc[~is_text,
                    ["left_id", "right_id", "dropped_pairs", "side"]].copy()
        probe = g.loc[~is_text, "probe_id"].to_numpy(dtype="uint64")
        out["norm_text"] = pd.Series(probe).map(lookup).to_numpy(dtype=object)
        out = out[out["norm_text"].notna()]
        l = out["left_id"].to_numpy(dtype="uint64")
        r = out["right_id"].to_numpy(dtype="uint64")
        with np.errstate(over="ignore"):
            h = l * np.uint64(0x9E3779B97F4A7C15) ^ r
        out["_pb"] = (h % np.uint64(buckets)).astype("int64")
        return out.reset_index(drop=True)

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["left_id", "right_id", "side"])
              .drop_duplicates(["left_id", "right_id", "side"]))
        l = g[g["side"] == 0][["left_id", "right_id", "dropped_pairs",
                               "norm_text"]]
        r = g[g["side"] == 1][["left_id", "right_id", "norm_text"]]
        out = l.merge(r, on=["left_id", "right_id"],
                      suffixes=("_l", "_r"))
        out = out.rename(columns={"norm_text_l": "l_text",
                                  "norm_text_r": "r_text"})
        return out.reset_index(drop=True)

    return (both.groupby("_db").map_groups(
                lambda g: attach(g.drop(columns=["_db"])),
                batch_format="pandas")
            .groupby("_pb").map_groups(
                lambda g: pivot(g.drop(columns=["_pb"])),
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


def _verified_edges(keyed_ds, docs_ds, text_col: str, id_col: str,
                    jaccard_threshold: float, buckets: int):
    """Band rows → unique candidate pairs → word-Jaccard-verified edge
    set — the post-keyer half of the MinHash pipeline, shared by the
    production siphash keyer and the md5 ORACLE keyer so the oracle
    checks the same machinery."""
    cand = _candidate_pairs(keyed_ds, buckets)
    with_text = _pair_texts(cand, _slim_texts(docs_ds, text_col, id_col),
                            buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # transient per-pair sets ON PURPOSE (round-4 measurement):
        # pair-hash pivot buckets scatter a doc's pairs, so verify
        # blocks have ~zero text repetition and the factorized
        # batch_set_jaccard kernel has nothing to reuse — while its
        # thousands of LIVE sets per task × 32 concurrent workers
        # saturated the shared memory bus (word verify 4 s → ngram
        # analog 196 s vs 10 s for this loop at 1M docs).  The
        # per-pair loop's working set stays L2-sized.
        if not len(df):
            return df[["left_id", "right_id"]]
        sims = np.fromiter(
            (jaccard(a.split(), b.split())
             for a, b in zip(df["l_text"], df["r_text"])),
            dtype=np.float64, count=len(df))
        return df.loc[sims >= jaccard_threshold, ["left_id", "right_id"]]

    return with_text.map_batches(verify, batch_format="pandas",
                                 batch_size=None)


def minhash_edges(docs_ds, cfg: PipelineConfig | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  jaccard_threshold: float = 70.0, buckets: int = 32):
    """The verified near-dup edge set of ``minhash_dedup`` (LSH
    candidates → word-Jaccard verify), exposed so cluster-view
    surfaces (``minhash_dup_clusters``) and the dedup share one
    implementation."""
    cfg = cfg or PipelineConfig()
    keyed = docs_ds.map_batches(
        _keyer_task, fn_kwargs={
            "mode": "minhash", "cfg": cfg, "text_col": text_col,
            "id_col": id_col},
        batch_format="pandas")
    return _verified_edges(keyed, docs_ds, text_col, id_col,
                           jaccard_threshold, buckets)


def _md5_minhash_keys(df: pd.DataFrame, cfg: PipelineConfig,
                      text_col: str, id_col: str) -> pa.Table:
    """ORACLE-variant keyer: identical MinHash-LSH structure to the
    production ``minhash`` mode (same shingles, same seeded
    ``MinHasher`` permutation family, same band layout) with both
    hash seams swapped for DuckDB-replayable md5 — base shingle hash
    = ``md5_number_lower & 2^32-1``, band key = ``md5_number_lower``
    of ``"{band}:{sig csv}"``.  Per-shingle python-rate md5 by
    nature; the production siphash keyer stays vectorized."""
    from address_address_matching_ray.functions.minhash import (
        MinHasher, md5_lower64, shingles,
    )

    mh = MinHasher(cfg.dedup_minhash_perms, cfg.seed)
    bands = cfg.dedup_lsh_bands
    rows = cfg.dedup_minhash_perms // bands
    ids = df[id_col].to_numpy(dtype="uint64")
    out_ids: list[int] = []
    out_keys: list[str] = []
    for j, t in enumerate(df[text_col].fillna("")):
        sh = shingles(t.lower().split(), cfg.shingle_size)
        x = (md5_lower64(sh) & np.uint64((1 << 32) - 1)
             if sh else np.empty(0, dtype=np.uint64))
        sig = mh.signature(x)
        for b in range(bands):
            out_ids.append(int(ids[j]))
            out_keys.append(
                f"{b}:" + ",".join(str(int(v))
                                   for v in sig[b * rows:(b + 1) * rows]))
    return pa.table({
        "doc_id": pa.array(np.array(out_ids, dtype=np.uint64), pa.uint64()),
        "band_key": pa.array(md5_lower64(out_keys), pa.uint64())})


def minhash_dedup_md5(docs_ds, cfg: PipelineConfig | None = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      jaccard_threshold: float = 70.0, buckets: int = 32,
                      broadcast_threshold: int = 5_000_000):
    """MinHash-LSH near-dup removal with md5-replayable hash seams —
    the DuckDB-ORACLED twin of ``minhash_dedup``: signatures, banding,
    candidate machinery (``_candidate_pairs`` incl. caps), word-Jaccard
    verify, connected components and min-id keep all run through the
    SAME code as the production surface; only the two hash functions
    differ, so the oracle makes the whole LSH dedup hash-checkable.
    Valid in the cap-free regime (no band block near
    ``_BandCaps.max_block_size`` at oracle scales — pytest-asserted)."""
    cfg = cfg or PipelineConfig()
    keyed = docs_ds.map_batches(
        _md5_minhash_keys, fn_kwargs={
            "cfg": cfg, "text_col": text_col, "id_col": id_col},
        batch_format="pandas")
    edges = _verified_edges(keyed, docs_ds, text_col, id_col,
                            jaccard_threshold, buckets)
    return _dedup_from_edges(docs_ds, edges, id_col,
                             broadcast_threshold=broadcast_threshold)


def minhash_dedup(docs_ds, cfg: PipelineConfig | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  jaccard_threshold: float = 70.0, buckets: int = 32,
                  broadcast_threshold: int = 5_000_000):
    """MinHash-LSH near-dup removal (Broder-style): keep min-id
    representative of every near-dup component."""
    edges = minhash_edges(docs_ds, cfg, text_col, id_col,
                          jaccard_threshold, buckets)
    return _dedup_from_edges(docs_ds, edges, id_col,
                             broadcast_threshold=broadcast_threshold)


def minhash_dup_clusters(docs_ds, cfg: PipelineConfig | None = None,
                         text_col: str = "text", id_col: str = "doc_id",
                         jaccard_threshold: float = 70.0,
                         buckets: int = 32):
    """Near-dup CLUSTER view: instead of dropping duplicates, label
    them — (cluster_id, n_members) per multi-member component of the
    verified minhash edge graph.  Crawl pipelines use this to audit
    template families and pick a quality-weighted representative
    rather than blind min-id.

    Shape: ``connected_components`` ships slim (u64, u64) label rows;
    the membership count is one groupby over those labels (16-byte
    rows), never the text.  Every labeled node is an edge endpoint, so
    all clusters here have ≥ 2 members by construction.
    """
    edges = minhash_edges(docs_ds, cfg, text_col, id_col,
                          jaccard_threshold, buckets)
    return _clusters_from_edges(edges, buckets)


def _clusters_from_edges(edges_ds, buckets: int):
    """Verified edge set → (cluster_id, n_members) per multi-member
    component — the cluster-view tail shared by the production and
    md5-twin surfaces (so the oracle checks this code, not a copy)."""
    labels = connected_components(edges_ds.materialize())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch member-count combiner + cluster-hash bucket: a
        # groupby(cluster_id) directly sort-shuffles corpus-cardinality
        # keys on a dup-heavy crawl (the duplicate_ngram_coverage
        # lesson applied to int keys)
        vc = df.groupby("cluster_id", sort=False).size()
        out = pd.DataFrame({"cluster_id": vc.index.to_numpy("int64"),
                            "n_members": vc.to_numpy().astype("int64")})
        with np.errstate(over="ignore"):
            out["_b"] = ((out["cluster_id"].to_numpy("uint64")
                          * np.uint64(0x9E3779B97F4A7C15))
                         % np.uint64(buckets)).astype("int64")
        return out

    return (labels.map_batches(partial, batch_format="pandas")
            .groupby("_b").map_groups(
                lambda g: g.drop(columns=["_b"])
                .groupby("cluster_id", sort=False, as_index=False)
                ["n_members"].sum(),
                batch_format="pandas")
            .sort("cluster_id"))


def _ngram_verified_edges(keyed_ds, docs_ds, text_col: str, id_col: str,
                          n: int, threshold: float, buckets: int):
    """Band rows → char-n-gram-Jaccard-verified edges — shared by the
    production siphash keyer and the md5 ORACLE keyer."""
    cand = _candidate_pairs(keyed_ds, buckets)
    with_text = _pair_texts(cand, _slim_texts(docs_ds, text_col, id_col),
                            buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # transient per-pair sets on purpose — see minhash_dedup's
        # verify: factorization has nothing to reuse on pair-hash-
        # scattered blocks, and live set pools thrash the memory bus
        # (196 s vs 10 s at 1M docs, 32 workers)
        if not len(df):
            return df[["left_id", "right_id"]]
        sims = np.fromiter(
            (jaccard(char_ngrams(a, n), char_ngrams(b, n))
             for a, b in zip(df["l_text"], df["r_text"])),
            dtype=np.float64, count=len(df))
        return df.loc[sims >= threshold, ["left_id", "right_id"]]

    return with_text.map_batches(verify, batch_format="pandas",
                                 batch_size=None)


def ngram_dedup_md5(docs_ds, cfg: PipelineConfig | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    n: int = 5, threshold: float = 60.0,
                    buckets: int = 32,
                    broadcast_threshold: int = 5_000_000):
    """DuckDB-ORACLED twin of ``ngram_jaccard_dedup`` — the md5
    MinHash keyer feeds the same char-n-gram verify/CC/keep path."""
    cfg = cfg or PipelineConfig()
    keyed = docs_ds.map_batches(
        _md5_minhash_keys, fn_kwargs={
            "cfg": cfg, "text_col": text_col, "id_col": id_col},
        batch_format="pandas")
    edges = _ngram_verified_edges(keyed, docs_ds, text_col, id_col,
                                  n, threshold, buckets)
    return _dedup_from_edges(docs_ds, edges, id_col,
                             broadcast_threshold=broadcast_threshold)


def dup_clusters_md5(docs_ds, cfg: PipelineConfig | None = None,
                     text_col: str = "text", id_col: str = "doc_id",
                     jaccard_threshold: float = 70.0, buckets: int = 32):
    """DuckDB-ORACLED twin of ``minhash_dup_clusters``: the md5-seam
    edge set through ``connected_components`` → (cluster_id,
    n_members) per multi-member component."""
    cfg = cfg or PipelineConfig()
    keyed = docs_ds.map_batches(
        _md5_minhash_keys, fn_kwargs={
            "cfg": cfg, "text_col": text_col, "id_col": id_col},
        batch_format="pandas")
    edges = _verified_edges(keyed, docs_ds, text_col, id_col,
                            jaccard_threshold, buckets)
    return _clusters_from_edges(edges, buckets)


def simhash_dedup(docs_ds, cfg: PipelineConfig | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, buckets: int = 32,
                  broadcast_threshold: int = 5_000_000):
    """SimHash near-dup removal: band-sliced blocking + Hamming verify.

    No text leaves the keyer at all — the verify reads the two 64-bit
    signatures carried with the candidate pair."""
    cfg = cfg or PipelineConfig()
    keyed = docs_ds.map_batches(
        _keyer_task, fn_kwargs={
            "mode": "simhash", "cfg": cfg, "text_col": text_col,
            "id_col": id_col},
        batch_format="pandas")
    edges = _hamming_edges(keyed, max_hamming, buckets)
    return _dedup_from_edges(docs_ds, edges, id_col,
                             broadcast_threshold=broadcast_threshold)


def _hamming_edges(keyed_ds, max_hamming: int, buckets: int):
    """Band rows (with sigs) → Hamming-verified edges — shared by the
    production simhash keyer and the md5 ORACLE keyer."""
    cand = _candidate_pairs(keyed_ds, buckets, carry_sig=True)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["left_id", "right_id"]]
        d = hamming_distance(df["l_sig"].to_numpy(dtype="uint64"),
                             df["r_sig"].to_numpy(dtype="uint64"))
        return df.loc[d <= max_hamming, ["left_id", "right_id"]]

    return cand.map_batches(verify, batch_format="pandas",
                            batch_size=None)


def _md5_simhash_keys(df: pd.DataFrame, cfg: PipelineConfig,
                      text_col: str, id_col: str) -> pa.Table:
    """ORACLE-variant simhash keyer: per-token 64-bit hash = DuckDB-
    replayable ``md5_number_lower`` (replacing the mix-multiply
    widening, which wraps mod 2^64 — SQL-hostile); the vote/sign
    signature, 16-bit band slices and Hamming verify are the
    production machinery.  Band key = md5 of ``"{band}:{slice}"``."""
    from address_address_matching_ray.functions.minhash import md5_lower64

    ids = df[id_col].to_numpy(dtype="uint64")
    shifts = np.arange(64, dtype=np.uint64)
    out_ids, out_keys, out_sigs = [], [], []
    for j, t in enumerate(df[text_col].fillna("")):
        toks = t.lower().split()
        if toks:
            h = md5_lower64(toks)
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)
                    ).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sig = int((np.uint64(1) << shifts)[votes > 0].sum())
        else:
            sig = 0
        for b in range(4):
            out_ids.append(int(ids[j]))
            out_keys.append(f"{b}:{(sig >> (16 * b)) & 0xFFFF}")
            out_sigs.append(sig)
    return pa.table({
        "doc_id": pa.array(np.array(out_ids, dtype=np.uint64), pa.uint64()),
        "band_key": pa.array(md5_lower64(out_keys), pa.uint64()),
        "sig": pa.array(np.array(out_sigs, dtype=np.uint64), pa.uint64())})


def simhash_dedup_md5(docs_ds, cfg: PipelineConfig | None = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3, buckets: int = 32,
                      broadcast_threshold: int = 5_000_000):
    """DuckDB-ORACLED twin of ``simhash_dedup`` — same candidate/
    verify/CC/keep machinery, md5 hash seams (see ``_md5_simhash_keys``)."""
    cfg = cfg or PipelineConfig()
    keyed = docs_ds.map_batches(
        _md5_simhash_keys, fn_kwargs={
            "cfg": cfg, "text_col": text_col, "id_col": id_col},
        batch_format="pandas")
    edges = _hamming_edges(keyed, max_hamming, buckets)
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
    edges = _ngram_verified_edges(keyed, docs_ds, text_col, id_col,
                                  n, threshold, buckets)
    return _dedup_from_edges(docs_ds, edges, id_col,
                             broadcast_threshold=broadcast_threshold)


def all_pairs_jaccard(docs_ds, threshold: float = 70.0,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_corpus_rows: int = 100_000):
    """Brute-force all-pairs token-set Jaccard ≥ ``threshold`` — the
    DuckDB-checkable oracle surface for the dedup VERIFY arithmetic
    (``batch_set_jaccard``; SQL side: ``list_intersect`` over
    ``string_split_regex`` token lists).

    O(n²) pairs BY DESIGN: this exists to prove the verify math
    against SQL at test scale, where LSH candidate generation itself
    can't be expressed.  The production dedup pipelines
    (minhash/simhash/ngram) bound pairs via LSH; this one refuses
    corpora past ``max_corpus_rows`` instead of pretending to scale.

    Per-batch shape is still the scale-correct one: the normalized
    corpus is broadcast ONCE (``ray.put``), each batch pairs its rows
    against the higher-id slice, and ``batch_set_jaccard`` factorizes
    the corpus texts per batch."""
    import ray

    slim = _slim_texts(docs_ds, text_col, id_col)
    n = slim.count()
    if n > max_corpus_rows:
        raise ValueError(
            f"all_pairs_jaccard is the O(n²) verify-math oracle, not a "
            f"dedup pipeline: corpus has {n} rows > {max_corpus_rows}; "
            f"use minhash_dedup/ngram_jaccard_dedup instead")
    corpus = slim.to_pandas().sort_values("doc_id")
    ids = corpus["doc_id"].to_numpy(dtype="uint64")
    txt = corpus["norm_text"].to_numpy(dtype=object)
    ref = ray.put((ids, txt))

    def pairs(t: pa.Table) -> pa.Table:
        k, tx = ray.get(ref)
        l_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
        l_txt = t["norm_text"].to_numpy(zero_copy_only=False)
        # each left row pairs with every corpus doc of HIGHER id
        pos = np.searchsorted(k, l_ids, side="right")
        lens = len(k) - pos
        total = int(lens.sum())
        if total == 0:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        r_idx = (np.repeat(pos - np.concatenate([[0], np.cumsum(lens)[:-1]]),
                           lens) + np.arange(total))
        l_rep = np.repeat(np.arange(len(l_ids)), lens)
        sims = batch_set_jaccard(l_txt[l_rep], tx[r_idx], str.split)
        keep = sims >= threshold
        return pa.table({
            "left_id": pa.array(l_ids[l_rep[keep]].astype("int64")),
            "right_id": pa.array(k[r_idx[keep]].astype("int64")),
            "sim": pa.array(np.floor(sims[keep] * 1e6) / 1e6)})

    return slim.map_batches(pairs, batch_format="pyarrow", batch_size=256)


def url_dedup(pages_ds, buckets: int = 64, sort: bool = True):
    """Exact dedup of crawl pages by CANONICAL URL (scheme/www/
    trailing-slash/fragment dropped, tracking params removed, surviving
    params sorted — ``stages.keys.canonical_url``): one row per
    canonical url with the smallest doc_id as the keeper and the
    duplicate count.  This is the first dedup pass a crawl pipeline
    runs — it removes re-crawls of the same resource before any
    content hashing.

    Shape: vectorized canonicalization per batch (pruned url column
    only) → per-batch partial (min, count) per curl → one hash-bucketed
    shuffle of the PARTIALS (slim rows, not pages) → vectorized
    per-bucket final reduce.  Canonical urls are corpus-cardinality, so
    no per-key Ray groups and no driver pull."""
    import pandas as pd

    from address_address_matching_ray.stages.keys import (
        canonical_url_series,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "curl": canonical_url_series(df["url"]).to_numpy(object),
            "doc_id": df["doc_id"].to_numpy()})
        g = (d.groupby("curl", as_index=False)
             .agg(keep_id=("doc_id", "min"), n_pages=("doc_id", "size")))
        g["n_pages"] = g["n_pages"].astype("int64")
        h = pd.util.hash_array(g["curl"].to_numpy(dtype=object))
        g["_b"] = (h % np.uint64(buckets)).astype("int64")
        return g

    def bucket_final(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("curl", as_index=False)
               .agg(keep_id=("keep_id", "min"), n_pages=("n_pages", "sum")))
        out["n_pages"] = out["n_pages"].astype("int64")
        return out

    out = (pages_ds.map_batches(partial, batch_format="pandas")
           .groupby("_b").map_groups(
               lambda g: bucket_final(g.drop(columns=["_b"])),
               batch_format="pandas"))
    return out.sort("curl") if sort else out


def novelty_filter(new_pages, snapshot_pages, buckets: int = 64):
    """Incremental crawl novelty filter: dedup the NEW crawl batch by
    canonical URL, then drop every canonical that already exists in the
    prior snapshot — the "what did this crawl add" op that runs between
    re-crawls before any content processing.

    Shape: the new batch collapses through ``url_dedup``'s slim partial
    reduce (one bucketed shuffle of (curl, min, count) rows); the
    snapshot contributes only per-batch-distinct uint64 canonical
    hashes (8 B/row — page bytes and even url strings never leave the
    snapshot scan); the anti-join is the shared bucketed
    ``membership_join``.  A 2⁻⁶⁴ canonical-hash collision at worst
    drops one genuinely novel page (same caveat as the LSH band keys).
    """
    import pandas as pd

    from address_address_matching_ray.pipelines.join import membership_join
    from address_address_matching_ray.stages.keys import (
        canonical_url_series,
    )

    deduped = url_dedup(new_pages, buckets=buckets, sort=False)

    def probe_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_nk"] = pd.util.hash_array(df["curl"].to_numpy(dtype=object))
        return df

    def snap_keys(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(
            canonical_url_series(df["url"]).to_numpy(dtype=object))
        return pd.DataFrame({"_nk": np.unique(h)})

    out = membership_join(
        deduped.map_batches(probe_key, batch_format="pandas"),
        snapshot_pages.map_batches(snap_keys, batch_format="pandas"),
        id_col="_nk", keep=False, buckets=buckets)
    return out.drop_columns(["_nk"]).sort("curl")


def containment_pairs(docs_ds, threshold: float = 80.0,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_corpus_rows: int = 100_000):
    """All-pairs token-set CONTAINMENT ≥ ``threshold`` in either
    direction — the asymmetric near-dup relation (quoted/embedded
    text: a paragraph wholly inside a longer page scores low Jaccard
    but 100 containment; Broder's resemblance-vs-containment
    distinction).  Emits ``(left_id, right_id, cont_lr, cont_rl)``
    with left < right; ``cont_lr`` = % of left's tokens inside right.

    Like ``all_pairs_jaccard`` this is the O(n²)-by-design ORACLE
    surface for the containment arithmetic, corpus-size-guarded.
    At scale, containment candidates need size-aware generation
    (prefix filtering / partitioned MinHash over the SMALLER side):
    resemblance-LSH (minhash_dedup's keyer) co-buckets near-equal
    pairs but systematically misses small-in-big containment — that
    gap is the documented reason this surface exists separately
    rather than as a verify mode of the LSH pipelines."""
    import ray

    from address_address_matching_ray.functions.minhash import (
        batch_set_containment,
    )

    slim = _slim_texts(docs_ds, text_col, id_col)
    n = slim.count()
    if n > max_corpus_rows:
        raise ValueError(
            f"containment_pairs is the O(n²) verify-math oracle, not a "
            f"dedup pipeline: corpus has {n} rows > {max_corpus_rows}")
    corpus = slim.to_pandas().sort_values("doc_id")
    ids = corpus["doc_id"].to_numpy(dtype="uint64")
    txt = corpus["norm_text"].to_numpy(dtype=object)
    ref = ray.put((ids, txt))

    def pairs(t: pa.Table) -> pa.Table:
        k, tx = ray.get(ref)
        l_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
        l_txt = t["norm_text"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k, l_ids, side="right")
        lens = len(k) - pos
        total = int(lens.sum())
        empty = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "cont_lr": pa.array([], pa.float64()),
                          "cont_rl": pa.array([], pa.float64())})
        if total == 0:
            return empty
        r_idx = (np.repeat(pos - np.concatenate([[0], np.cumsum(lens)[:-1]]),
                           lens) + np.arange(total))
        l_rep = np.repeat(np.arange(len(l_ids)), lens)
        c_lr, c_rl = batch_set_containment(l_txt[l_rep], tx[r_idx],
                                           str.split)
        keep = np.maximum(c_lr, c_rl) >= threshold
        if not keep.any():
            return empty
        return pa.table({
            "left_id": pa.array(l_ids[l_rep[keep]].astype("int64")),
            "right_id": pa.array(k[r_idx[keep]].astype("int64")),
            "cont_lr": pa.array(np.floor(c_lr[keep] * 1e6) / 1e6),
            "cont_rl": pa.array(np.floor(c_rl[keep] * 1e6) / 1e6)})

    return slim.map_batches(pairs, batch_format="pyarrow", batch_size=256)


def jaccard_join(docs_ds, threshold: float = 70.0,
                 text_col: str = "text", id_col: str = "doc_id",
                 buckets: int = 64, token_df_cap: int = 100_000):
    """EXACT token-set Jaccard similarity join at scale — the
    deterministic, no-miss-rate alternative to ``minhash_edges``'
    LSH candidate generation, built on the same prefix-filter
    machinery as ``containment_join``.

    Exactness argument for Jaccard: ``J = i/(a+b−i) ≥ t`` with
    ``b ≥ i`` forces ``i ≥ t·a`` (and symmetrically ``i ≥ t·b``), so
    each doc's ``⌈t·sz⌉``-prefix catches every qualifying pair through
    its own side; the size filter keeps only index docs with
    ``t·a ≤ b`` AND ``a ≥ t·b`` (both necessary for J ≥ t).  Output
    matches ``all_pairs_jaccard`` / the ``jaccard_verify`` oracle
    (same kernel arithmetic, same floor-1e-6 ``sim``), restricted to
    docs with non-empty token sets.  Same hot-token cap accounting
    (``dropped_pairs``)."""
    return _prefix_join(docs_ds, threshold, "jaccard", text_col, id_col,
                        buckets, token_df_cap)


def containment_join(docs_ds, threshold: float = 80.0,
                     text_col: str = "text", id_col: str = "doc_id",
                     buckets: int = 64, token_df_cap: int = 100_000):
    """EXACT containment similarity join at scale — prefix filtering
    (the PPJoin/AllPairs construction, Chaudhuri/Xiao et al., public),
    not LSH: emits every pair with token-set containment ≥
    ``threshold`` in either direction, with NO probabilistic misses.

    Prefix lemma: order all tokens globally by (document frequency,
    token); if ``|A∩B| ≥ α`` then A's first ``|A| − α + 1`` tokens in
    that order contain an overlap token (pigeonhole).  With
    ``α = ⌈t·|A|⌉`` (exact integer ceil in 1e-6 units — a float
    ``ceil(0.8·5)`` is 5, not 4, and would silently miss boundary
    pairs), probing each doc's prefix against an inverted index of ALL
    tokens catches every pair qualifying through that doc's direction;
    probing both docs covers ``max(c_lr, c_rl) ≥ t``.

    Stages (all bucketed, no per-key Ray groups, no driver pulls
    outside ``_pair_texts``' gated broadcast):
      1. explode distinct (doc, token) rows + per-doc set size;
      2. token df via per-batch combiner + token-hash bucketed sum;
      3. df attach (token-hash buckets) → per-doc prefix ranks
         (doc-hash buckets) → probe rows;
      4. probe ∪ index pair merge per token-hash bucket, with the
         size filter ``|B|·1e6 ≥ t_µ·|A|`` (a smaller B can never
         satisfy A's direction) and canonical (lo, hi);
      5. ``_pair_texts`` attach + transient per-pair set verify (the
         measured-fastest verify shape; BASELINE round 4).

    Hot tokens: an index block for token w has df(w) entries; a probe
    row on a hot w would emit df(w) pairs.  Blocks beyond
    ``token_df_cap`` keep the cap-first index entries by doc_id and
    CARRY the drop count on every emitted pair (``dropped_pairs``,
    max across a pair's tokens after dedup — the pairs_stage
    accounting; nothing is silently truncated).  A pair is missed
    only if every shared prefix token is capped-hot — prefix tokens
    are each doc's RAREST, so on Zipf-shaped webtext this needs a
    stopword-only doc.  Exactness therefore holds whenever
    ``dropped_pairs`` comes back all-zero, which the sf-scale oracle
    parity asserts."""
    return _prefix_join(docs_ds, threshold, "containment", text_col,
                        id_col, buckets, token_df_cap)


def _prefix_join(docs_ds, threshold: float, mode: str, text_col: str,
                 id_col: str, buckets: int, token_df_cap: int):
    import ray  # noqa: F401

    assert mode in ("containment", "jaccard")
    t_micro = int(round(threshold * 10_000))      # percent → 1e-6 units

    slim = _slim_texts(docs_ds, text_col, id_col).materialize()

    # Tokens are HASH-COMPACTED to uint64 immediately: every shuffle,
    # merge and sort downstream moves fixed-width ints, never token
    # strings (the repo-wide hash-compacted-keys rule; the string
    # variant measured >10 min at 1M docs where this one takes ~1 min).
    # Exactness survives compaction: the prefix lemma needs only a
    # CONSISTENT global token order — (df, hash) is one — and in hash
    # space |A_h ∩ B_h| ≥ |A ∩ B|, so a collision can only ADD a
    # candidate pair (rejected by the exact-text verify), never lose
    # one; sizes/filters all live in the same hash space.
    def explode(t: pa.Table) -> pa.Table:
        import polars as pl

        lists = pc.utf8_split_whitespace(t["norm_text"].combine_chunks())
        flat = pc.list_flatten(lists)
        if len(flat) == 0:
            return pa.table({"doc_id": pa.array([], pa.uint64()),
                             "th": pa.array([], pa.uint64()),
                             "sz": pa.array([], pa.int64())})
        parent = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False)
        th = pl.from_arrow(flat).hash(seed=0).to_numpy().astype("uint64")
        ids = t["doc_id"].to_numpy(zero_copy_only=False) \
                         .astype("uint64")[parent]
        order = np.lexsort((th, ids))
        ids, th = ids[order], th[order]
        keep = np.concatenate(
            [[True], (ids[1:] != ids[:-1]) | (th[1:] != th[:-1])])
        ids, th = ids[keep], th[keep]
        starts = np.flatnonzero(
            np.concatenate([[True], ids[1:] != ids[:-1]]))
        cnt = np.diff(np.concatenate([starts, [len(ids)]]))
        return pa.table({
            "doc_id": pa.array(ids, pa.uint64()),
            "th": pa.array(th, pa.uint64()),
            "sz": pa.array(np.repeat(cnt, cnt).astype("int64"))})

    exploded = slim.map_batches(explode, batch_format="pyarrow",
                                batch_size=4096).materialize()

    def _b_of(th: np.ndarray) -> np.ndarray:
        return (th % np.uint64(buckets)).astype("int64")

    # ── token document frequency (combiner + bucketed sum) ──
    def df_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["th"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"th": pa.array(u, pa.uint64()),
                         "c": pa.array(c.astype("int64")),
                         "_b": pa.array(_b_of(u))})

    def df_reduce(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("th", as_index=False, sort=False)["c"].sum()
        return pd.DataFrame({"th": r["th"].to_numpy("uint64"),
                             "df": r["c"].to_numpy("int64")})

    # barriers: chaining four sort-shuffles into one streaming DAG
    # measured ~8× slower than running them with pinned handoffs (the
    # staged run of the identical kernels totals ~70 s at 1M docs);
    # df_tbl/probes are the cheap pin points (slim int rows)
    df_tbl = (exploded.map_batches(df_partial, batch_format="pyarrow")
              .groupby("_b").map_groups(
                  lambda g: df_reduce(g.drop(columns=["_b"])),
                  batch_format="pandas")).materialize()

    # ── df attach (token buckets), then prefix ranks (doc buckets) ──
    def tag_tok(t: pa.Table, is_df: bool) -> pa.Table:
        th = t["th"].to_numpy(zero_copy_only=False).astype("uint64")
        n = len(th)
        return pa.table({
            "th": pa.array(th, pa.uint64()),
            "doc_id": (pc.cast(t["doc_id"], pa.uint64()) if not is_df
                       else pa.array(np.zeros(n, "uint64"), pa.uint64())),
            "sz": (t["sz"] if not is_df
                   else pa.array(np.zeros(n, "int64"))),
            "df": (pc.cast(t["df"], pa.int64()) if is_df
                   else pa.array(np.full(n, -1, "int64"))),
            "_b": pa.array(_b_of(th))})

    tagged = (exploded.map_batches(
        lambda t: tag_tok(t, False), batch_format="pyarrow")
        .union(df_tbl.map_batches(lambda t: tag_tok(t, True),
                                  batch_format="pyarrow")))

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        dmap = g[g["df"] >= 0][["th", "df"]]
        rows = g[g["df"] < 0][["th", "doc_id", "sz"]]
        m = rows.merge(dmap, on="th", how="left")
        m["df"] = m["df"].fillna(1).astype("int64")
        with np.errstate(over="ignore"):
            m["_b2"] = ((m["doc_id"].to_numpy("uint64")
                         * np.uint64(0x9E3779B97F4A7C15))
                        % np.uint64(buckets)).astype("int64")
        return m

    with_df = (tagged.groupby("_b").map_groups(
        lambda g: attach_df(g.drop(columns=["_b"])),
        batch_format="pandas"))

    def prefixes(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "df", "th"], kind="mergesort")
        rank = g.groupby("doc_id", sort=False).cumcount().to_numpy()
        sz = g["sz"].to_numpy("int64")
        alpha = -(-np.int64(t_micro) * sz // np.int64(1_000_000))
        keep = rank < (sz - alpha + 1)
        return g[keep][["th", "doc_id", "sz"]].copy()

    probes = with_df.groupby("_b2").map_groups(
        lambda g: prefixes(g.drop(columns=["_b2"])),
        batch_format="pandas").materialize()

    # ── probe × full-index pair merge per token bucket ──
    def tag_side(df: pd.DataFrame, side: int) -> pd.DataFrame:
        out = df[["th", "doc_id", "sz"]].copy()
        out["side"] = np.int8(side)
        out["_b"] = _b_of(out["th"].to_numpy("uint64"))
        return out

    sided = (probes.map_batches(lambda d: tag_side(d, 0),
                                batch_format="pandas")
             .union(exploded.map_batches(
                 lambda t: tag_side(t.to_pandas(), 1),
                 batch_format="pyarrow")))

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["side"] == 0]
        ix = g[g["side"] == 1].sort_values(["th", "doc_id"],
                                           kind="mergesort")
        empty = pd.DataFrame({
            "left_id": pd.array([], dtype="uint64"),
            "right_id": pd.array([], dtype="uint64"),
            "dropped_pairs": pd.array([], dtype="uint64")})
        if not len(pr) or not len(ix):
            return empty
        # cap hot index blocks, carrying the per-token drop count
        blk = ix.groupby("th", sort=False)["doc_id"]
        rank = blk.cumcount().to_numpy()
        dfn = blk.transform("size").to_numpy()
        ix = ix[rank < token_df_cap].copy()
        ix["_drop"] = np.maximum(
            dfn[rank < token_df_cap] - token_df_cap, 0).astype("uint64")
        m = pr.merge(ix, on="th", suffixes=("_a", "_x"))
        if not len(m):
            return empty
        sza = m["sz_a"].to_numpy("int64")
        szx = m["sz_x"].to_numpy("int64")
        da = m["doc_id_a"].to_numpy("uint64")
        dx = m["doc_id_x"].to_numpy("uint64")
        ok = (da != dx) & (szx * np.int64(1_000_000)
                           >= np.int64(t_micro) * sza)
        if mode == "jaccard":
            # J ≥ t also needs a ≥ t·b — prune the other direction too
            ok &= sza * np.int64(1_000_000) >= np.int64(t_micro) * szx
        da, dx = da[ok], dx[ok]
        out = pd.DataFrame({
            "left_id": np.minimum(da, dx),
            "right_id": np.maximum(da, dx),
            "dropped_pairs": m["_drop"].to_numpy("uint64")[ok]})
        return (out.sort_values(["left_id", "right_id", "dropped_pairs"],
                                ascending=[True, True, False],
                                kind="mergesort")
                .drop_duplicates(["left_id", "right_id"], keep="first")
                .reset_index(drop=True))

    cand = sided.groupby("_b").map_groups(
        lambda g: pair_up(g.drop(columns=["_b"])), batch_format="pandas")

    # ── attach texts (gated broadcast / shuffle) + exact verify ──
    pt = _pair_texts(cand, slim, buckets=buckets)

    def verify_containment(t: pa.Table) -> pa.Table:
        lt = t["l_text"].to_numpy(zero_copy_only=False)
        rt = t["r_text"].to_numpy(zero_copy_only=False)
        n = len(lt)
        c_lr = np.empty(n, dtype="float64")
        c_rl = np.empty(n, dtype="float64")
        for j in range(n):           # transient per-pair loop, by
            sa = set(lt[j].split())  # measurement (BASELINE round 4)
            sb = set(rt[j].split())
            i = len(sa & sb)
            c_lr[j] = 100.0 * i / len(sa) if sa else 100.0
            c_rl[j] = 100.0 * i / len(sb) if sb else 100.0
        keep = np.maximum(c_lr, c_rl) >= threshold
        return pa.table({
            "left_id": pc.cast(t["left_id"], pa.int64()).filter(
                pa.array(keep)),
            "right_id": pc.cast(t["right_id"], pa.int64()).filter(
                pa.array(keep)),
            "cont_lr": pa.array(np.floor(c_lr[keep] * 1e6) / 1e6),
            "cont_rl": pa.array(np.floor(c_rl[keep] * 1e6) / 1e6),
            "dropped_pairs": t["dropped_pairs"].filter(pa.array(keep))})

    def verify_jaccard(t: pa.Table) -> pa.Table:
        lt = t["l_text"].to_numpy(zero_copy_only=False)
        rt = t["r_text"].to_numpy(zero_copy_only=False)
        n = len(lt)
        sim = np.empty(n, dtype="float64")
        for j in range(n):           # same transient-loop shape; same
            sa = set(lt[j].split())  # arithmetic as batch_set_jaccard
            sb = set(rt[j].split())
            i = len(sa & sb)
            u = len(sa) + len(sb) - i
            sim[j] = 100.0 * i / u if u else 100.0
        keep = sim >= threshold
        return pa.table({
            "left_id": pc.cast(t["left_id"], pa.int64()).filter(
                pa.array(keep)),
            "right_id": pc.cast(t["right_id"], pa.int64()).filter(
                pa.array(keep)),
            "sim": pa.array(np.floor(sim[keep] * 1e6) / 1e6),
            "dropped_pairs": t["dropped_pairs"].filter(pa.array(keep))})

    verify = (verify_containment if mode == "containment"
              else verify_jaccard)
    return pt.map_batches(verify, batch_format="pyarrow")
