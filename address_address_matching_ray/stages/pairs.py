"""Candidate-pair generation: the blocking shuffle.

Replaces the reference's per-query search retrieval (SURVEY §2.4 J1)
with ONE hash-partitioned exchange: key rows are bucketed by
``hash(block_key) % B`` and each bucket is processed by a single
vectorized task (the "explicit partitioned hash join" idiom — a
``groupby(bucket)`` shuffle whose groups are big enough that per-group
Python overhead vanishes; millions of tiny per-key ``map_groups`` calls
would be driver-side-loop slow at scale).

Inside a bucket (all rows of a block land in the same bucket):

- pairs are canonicalized ``left_id < right_id`` (SURVEY §2.8 D3)
- full cross-pairing for normal blocks; blocks beyond
  ``cfg.max_block_size``/``cfg.max_pairs_per_block`` are *window-paired*
  over doc_id-sorted members — each member pairs with its next W
  neighbors.  This keeps the block connected (adjacent pairs chain all
  members ⇒ no transitive-clustering recall loss) while capping the
  quadratic blow-up; dropped-pair counts are emitted per row
  (``dropped_pairs``) — no silent truncation (SURVEY §7.2 hard part 2).
- ``specificity = min(100/|block|, 20)`` — deterministic stand-in for
  the reference's retrieval relevance (``es_score``, quality bonus
  U:813-814; SURVEY §7.2 hard part 3).
- pairs arising from several keys are deduped per bucket keeping max
  specificity; cross-bucket duplicates are impossible for the same key
  and resolved by a second, pair-bucketed dedup pass for different keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from address_address_matching_ray.config import PipelineConfig
from address_address_matching_ray.stages.keys import PAYLOAD_COLS


def shuffle_partitions(size_bytes: int | None = None,
                       target_bytes: int = 256 * 2**20,
                       max_parts: int = 8192) -> int:
    """Partition count for a wide shuffle: ≥ 2×cluster CPUs (keep every
    core busy), ≥ size/target (bound per-partition bytes), ≤ max_parts.

    Matters because Ray's sort shuffle creates in×out block fragments:
    a 1-GB table arriving in 256 small blocks made 65k tiny shuffle
    objects whose scheduling overhead dominated (45 s for ~15 s of
    work); coalescing to 2×CPU blocks first cut the stage to 6 s.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 16)) if ray.is_initialized() else 16
    parts = 2 * cpus
    if size_bytes:
        parts = max(parts, -(-size_bytes // target_bytes))
    return min(parts, max_parts)


def _pair_indices(n: int, cfg: PipelineConfig) -> tuple[np.ndarray, np.ndarray, int]:
    """Local (left, right) index pairs for a block of n sorted members.

    Capped blocks get window pairs (each member × next W neighbors)
    PLUS star pairs to the block minimum: the star keeps the *accepted*
    subgraph's diameter ~2, so transitive clustering converges in O(1)
    label-propagation rounds instead of O(block size) along a window
    chain (pathological for the distributed fixpoint).
    """
    total = n * (n - 1) // 2
    if n <= cfg.max_block_size and total <= cfg.max_pairs_per_block:
        li, ri = np.triu_indices(n, k=1)
        return li, ri, 0
    w = max(1, min(n - 1, cfg.max_pairs_per_block // n))
    li = np.concatenate([np.arange(n - d) for d in range(1, w + 1)]
                        + [np.zeros(n - 1 - w, dtype=np.int64)])
    ri = np.concatenate([np.arange(d, n) for d in range(1, w + 1)]
                        + [np.arange(w + 1, n)])
    return li, ri, total - len(li)


def pairs_for_groups(starts: np.ndarray, sizes: np.ndarray, cfg: PipelineConfig
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray, np.ndarray]:
    """Vectorized (gl, gr, group_start, specificity, dropped) pair-index
    generation for MANY blocks at once.

    Blocks under the caps are cross-paired in bulk, grouped by block
    SIZE — one ``triu_indices`` per DISTINCT size, broadcast over every
    block of that size.  A per-tiny-block Python loop (the previous
    shape) was the measured linkage hot spot at 1M docs: millions of
    2-5-member blocks each paying a Python iteration + several tiny
    numpy allocations.  Oversized blocks (rare) still take the
    windowed+star path individually.
    """
    total = sizes * (sizes - 1) // 2
    normal = (sizes <= cfg.max_block_size) & (total <= cfg.max_pairs_per_block)
    GL, GR, OWN, SP, DP = [], [], [], [], []
    st_n, sz_n = starts[normal], sizes[normal]
    for n in np.unique(sz_n):
        li, ri = np.triu_indices(int(n), k=1)
        s = st_n[sz_n == n]                      # all blocks of this size
        npair = len(li)
        GL.append((s[:, None] + li[None, :]).ravel())
        GR.append((s[:, None] + ri[None, :]).ravel())
        OWN.append(np.repeat(s, npair))
        SP.append(np.full(len(s) * npair, min(100.0 / int(n), 20.0)))
        DP.append(np.zeros(len(s) * npair, dtype="uint64"))
    for s, n in zip(starts[~normal], sizes[~normal]):
        li, ri, dropped = _pair_indices(int(n), cfg)
        GL.append(s + li)
        GR.append(s + ri)
        OWN.append(np.full(len(li), s))
        SP.append(np.full(len(li), min(100.0 / int(n), 20.0)))
        DP.append(np.full(len(li), dropped, dtype="uint64"))
    if not GL:
        z = np.array([], dtype=np.int64)
        return z, z, z, np.array([], dtype=np.float64), np.array([], dtype="uint64")
    return (np.concatenate(GL), np.concatenate(GR), np.concatenate(OWN),
            np.concatenate(SP), np.concatenate(DP))


def make_pairs_bucket_arrow(t: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """One bucket of key rows → canonical candidate pairs, entirely in
    Arrow: C++ sort, boundary masks on numpy views, pair payload built
    with ``pc.take`` gathers — no Python-object string materialization
    (a pandas group conversion built ~1.4M PyUnicode objects per 60k-row
    bucket and dominated the stage)."""
    if t.num_rows == 0:
        return _empty_pairs_arrow()
    t = t.sort_by([("block_key", "ascending"), ("doc_id", "ascending")])
    n = t.num_rows
    bk = t["block_key"].combine_chunks()
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    if n > 1:
        new_bk = pc.not_equal(bk.slice(1), bk.slice(0, n - 1)) \
                   .to_numpy(zero_copy_only=False)
        dup = (~new_bk) & (doc[1:] == doc[:-1])
        if dup.any():                      # same doc under same key twice
            t = t.filter(pa.array(np.concatenate([[True], ~dup])))
            n = t.num_rows
            bk = t["block_key"].combine_chunks()
            doc = t["doc_id"].to_numpy(zero_copy_only=False)
            new_bk = pc.not_equal(bk.slice(1), bk.slice(0, n - 1)) \
                       .to_numpy(zero_copy_only=False)
    else:
        new_bk = np.array([], dtype=bool)
    starts = np.flatnonzero(np.concatenate([[True], new_bk]))
    ends = np.concatenate([starts[1:], [n]])
    sizes = ends - starts
    multi = sizes >= 2
    if not multi.any():
        return _empty_pairs_arrow()
    gl, gr, own, sp, dp = pairs_for_groups(starts[multi], sizes[multi], cfg)
    if not len(gl):
        return _empty_pairs_arrow()
    gl_a, gr_a, own_a = pa.array(gl), pa.array(gr), pa.array(own)
    # members are doc_id-sorted within a block → left < right already
    cols = {
        "left_id": pa.array(doc[gl], pa.uint64()),
        "right_id": pa.array(doc[gr], pa.uint64()),
        "block_key": pc.take(bk, own_a),
        "key_kind": pc.take(t["key_kind"], own_a),
        "specificity": pa.array(sp, pa.float64()),
        "dropped_pairs": pa.array(dp, pa.uint64()),
    }
    for c in PAYLOAD_COLS:
        col = t[c]
        cols[f"l_{c}"] = pc.take(col, gl_a)
        cols[f"r_{c}"] = pc.take(col, gr_a)
    return _dedup_pairs_bucket_arrow(pa.table(cols))


def _dedup_pairs_bucket_arrow(t: pa.Table) -> pa.Table:
    """Cross-key pair dedup within a bucket, keeping max specificity
    (ties → lexicographically first block_key) — Arrow sort + boundary
    mask."""
    if t.num_rows == 0:
        return t
    t = t.sort_by([("left_id", "ascending"), ("right_id", "ascending"),
                   ("specificity", "descending"), ("block_key", "ascending")])
    l = t["left_id"].to_numpy(zero_copy_only=False)
    r = t["right_id"].to_numpy(zero_copy_only=False)
    keep = np.concatenate([[True], (l[1:] != l[:-1]) | (r[1:] != r[:-1])])
    return t.filter(pa.array(keep)) if not keep.all() else t


def make_pairs_bucket(df: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """pandas-compat wrapper over ``make_pairs_bucket_arrow`` (tests /
    ad-hoc use; the pipeline calls the Arrow version directly)."""
    out = make_pairs_bucket_arrow(
        pa.Table.from_pandas(df, preserve_index=False), cfg)
    return out.to_pandas()


def _pairs_schema() -> pa.Schema:
    fields = [("left_id", pa.uint64()), ("right_id", pa.uint64()),
              ("block_key", pa.string()), ("key_kind", pa.string()),
              ("specificity", pa.float64()), ("dropped_pairs", pa.uint64())]
    fields += [(f"l_{c}", pa.string()) for c in PAYLOAD_COLS]
    fields += [(f"r_{c}", pa.string()) for c in PAYLOAD_COLS]
    return pa.schema(fields)


def _empty_pairs_arrow() -> pa.Table:
    """Typed empty table — schema-stable empty blocks (untyped empties
    triggered 'RefBundle with a different schema' executor warnings)."""
    return _pairs_schema().empty_table()


def _empty_pairs() -> pd.DataFrame:
    return _empty_pairs_arrow().to_pandas()


def _dedup_pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Cross-key pair dedup within a pair-hash bucket (vectorized)."""
    if not len(df):
        return df
    df = df.sort_values(["left_id", "right_id", "specificity", "block_key"],
                        ascending=[True, True, False, True], kind="mergesort")
    return df.drop_duplicates(["left_id", "right_id"], keep="first").reset_index(drop=True)


def _bucket_of(h: np.ndarray, buckets: int) -> np.ndarray:
    return (h % np.uint64(buckets)).astype("int64")


def _hash_strings(arr) -> np.ndarray:
    """Deterministic uint64 hash of an Arrow string array WITHOUT
    per-element Python-object materialization (polars xxhash runs over
    the Arrow buffers directly).  Used only for partition/bucket
    placement — never for values — so cross-version stability is not
    load-bearing."""
    import polars as pl

    return pl.from_arrow(arr).hash(seed=0).to_numpy().astype(np.uint64)


#: doc_id sample modulus shared by pass 0 and callers that pre-sample
#: upstream of key derivation (see ``pairs_stage(hot_keys_input=...)``).
HOT_SAMPLE_MOD = 8


def _find_hot_keys(keys_ds, threshold: int, buckets: int = 64,
                   sample_mod: int = HOT_SAMPLE_MOD,
                   keys_size_bytes: int | None = None,
                   driver_bytes_threshold: int = 2**32,
                   already_sampled: bool = False) -> set:
    """Pass 0: keys whose row count exceeds ``threshold``.

    Shape matters: a ``groupby(block_key).sum`` would create millions of
    single-row groups (Python-per-group in the aggregate finalize — it
    measured 570 s on 12M keys).  Instead: project to the bare key
    column, per-batch partial counts (combiner), bucket by
    ``hash(key) % B``, ONE vectorized value_counts per bucket.

    Counts run over a DETERMINISTIC 1/``sample_mod`` doc_id sample with
    the threshold scaled down: salting is a load guard, not an exact
    count — a hot key's members are uniform in doc_id, and at
    threshold ≥ 1600 the sampled estimate's noise (±√(threshold/mod))
    cannot flip a materially hot key.  Sample keys stay stable across
    runs/retries, so salting decisions stay deterministic.

    ``already_sampled``: the caller delivered a keys Dataset whose docs
    are ALREADY the ``doc_id % sample_mod == 0`` sample (taken upstream
    of key derivation, where it is ~``sample_mod``× cheaper when keys
    are re-derived from a checkpoint rather than pinned).  The sampled
    row sets are identical either way — every key row of a doc carries
    the doc's id — so only the redundant filter is skipped; threshold
    scaling still applies.
    """
    if already_sampled:
        threshold = max(2, threshold // sample_mod)
    elif sample_mod > 1:
        assert sample_mod & (sample_mod - 1) == 0, "sample_mod: power of 2"
        mask = np.uint64(sample_mod - 1)

        def sample(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids & mask) == 0))

        keys_ds = keys_ds.map_batches(sample, batch_format="pyarrow")
        threshold = max(2, threshold // sample_mod)

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native per-batch combiner: value_counts + bucket id,
        # no pandas/object conversion (the shuffle then moves compact
        # Arrow string buffers, not pickled object arrays)
        vc = pc.value_counts(t["block_key"].combine_chunks())
        keys = vc.field("values")
        h = _hash_strings(keys)
        return pa.table({
            "block_key": keys,
            "c": pc.cast(vc.field("counts"), pa.int64()),
            "_b": pa.array((h % np.uint64(buckets)).astype("int64")),
        })

    def hot_in_bucket(g: pd.DataFrame) -> pa.Table:
        sums = g.groupby("block_key", sort=False)["c"].sum()
        hot = sums[sums > threshold]
        # Arrow out: typed even when empty (size estimation on empty
        # pandas object columns logs an error per block)
        return pa.table({"block_key": pa.array(hot.index, pa.string()),
                         "n": pa.array(hot.to_numpy(), pa.int64())})

    partials = keys_ds.select_columns(["block_key"]) \
                      .map_batches(partial, batch_format="pyarrow")

    if keys_size_bytes is not None and \
            keys_size_bytes // sample_mod <= driver_bytes_threshold:
        # small/medium path: the sampled per-batch partials are a few
        # MB — one driver-side vectorized sum beats a second Ray
        # shuffle's fixed cost (~1.5 s) by ~3×.  The distributed
        # bucketed path below stays the shape for corpus-scale key
        # tables (sampled partials can reach 10^10 rows at 100 TB).
        pdf = partials.to_pandas()
        if not len(pdf):
            return set()
        sums = pdf.groupby("block_key", sort=False)["c"].sum()
        return set(sums.index[sums > threshold])

    hot_pdf = (partials
               .repartition(shuffle_partitions())
               .groupby("_b").map_groups(
                   lambda g: hot_in_bucket(g.drop(columns=["_b"])),
                   batch_format="pandas")
               .to_pandas())
    return set(hot_pdf["block_key"]) if len(hot_pdf) else set()


def pairs_stage(keys_ds, cfg: PipelineConfig | None = None,
                buckets: int = 64, salt_hot: bool = True,
                dedup_cross_key: bool = True,
                keys_size_bytes: int | None = None,
                hot_keys_input=None):
    """keys → deduped candidate pairs.

    Shuffle #0 (optional, combiner-pre-aggregated): count keys → hot set.
    Shuffle #1: ``groupby(key_bucket)`` (key = hash(block_key) % B).
    Shuffle #2: ``groupby(pair_bucket)`` for cross-key dedup — smaller
    input (pairs already deduped per key-bucket).

    Skew: keys hotter than ``8 × cfg.max_block_size`` are SALTED —
    ``key#s{doc_id % salt_buckets}`` spreads one mega-block's ingestion
    across tasks (window capping alone bounds compute but still lands
    the whole block on one reducer).  Cross-salt connectivity for
    genuinely-duplicate content is kept by a ``key#bridge`` block
    holding a deterministic ~1/salt sample of the hot key's members
    (SURVEY §4.2: score cross-salt pairs against a capped sample).

    ``hot_keys_input``: optional keys-shaped Dataset restricted to the
    ``doc_id % HOT_SAMPLE_MOD == 0`` doc sample for pass 0.  Callers
    whose keys are RE-DERIVED lazily (checkpoint spill-through) pass
    ``keys_stage(extracted.filter(sample))`` here so pass 0 derives
    keys for 1/8 of the corpus instead of deriving all keys and then
    discarding 7/8 (key derivation dominated that pass — 378 s of a
    1,298 s 16M-page run before this knob).
    """
    cfg = cfg or PipelineConfig()

    hot: set = set()
    if salt_hot:
        # pass 0 consumes keys lazily: recomputing the (cheap, stateless)
        # key derivation from the materialized/checkpointed upstream is
        # cheaper than pinning the full key table in the object store
        hot = _find_hot_keys(hot_keys_input if hot_keys_input is not None
                             else keys_ds,
                             threshold=8 * cfg.max_block_size,
                             buckets=buckets,
                             keys_size_bytes=keys_size_bytes,
                             already_sampled=hot_keys_input is not None)

    import ray

    hot_ref = ray.put(hot)
    salt_n = max(2, cfg.salt_buckets)

    def add_key_bucket(t: pa.Table) -> pa.Table:
        # Arrow in/out: blocks stay compact string buffers through the
        # groupby shuffle (pandas object blocks pickled to 5× the bytes
        # and dominated the exchange)
        hotset = ray.get(hot_ref)
        if hotset:
            is_hot = pc.is_in(
                t["block_key"],
                value_set=pa.array(sorted(hotset), pa.string()),
            ).to_numpy(zero_copy_only=False)
            if is_hot.any():
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                # bridge block: a deterministic ~1/salt sample of the hot
                # key's members keeps cross-salt connectivity
                bridge_mask = is_hot & (((ids // salt_n) % salt_n) == 0)
                bridge = t.filter(pa.array(bridge_mask))
                bridge = bridge.set_column(
                    bridge.column_names.index("block_key"), "block_key",
                    pc.binary_join_element_wise(
                        bridge["block_key"],
                        pa.array(["#bridge"] * bridge.num_rows), ""))
                bk = t["block_key"].to_numpy(zero_copy_only=False).copy()
                salts = (ids % np.uint64(salt_n)).astype("int64")
                hot_idx = np.flatnonzero(is_hot)
                bk[hot_idx] = (bk[hot_idx] + "#s"
                               + salts[hot_idx].astype(str).astype(object))
                t = t.set_column(t.column_names.index("block_key"),
                                 "block_key", pa.array(bk, pa.string()))
                t = pa.concat_tables([t, bridge])
        h = _hash_strings(t["block_key"])
        return t.append_column("key_bucket",
                               pa.array(_bucket_of(h, buckets)))

    nparts = shuffle_partitions(keys_size_bytes)
    bucketed = (keys_ds.map_batches(add_key_bucket, batch_format="pyarrow")
                .repartition(nparts))
    pairs = bucketed.groupby("key_bucket").map_groups(
        lambda g: make_pairs_bucket_arrow(g.drop(["key_bucket"]), cfg),
        batch_format="pyarrow")

    if not dedup_cross_key:
        # skip shuffle #2: a pair co-blocked under keys in different
        # buckets gets scored more than once (dup factor ~1.2-2x) —
        # cheaper than shuffling the pair table now that scoring is
        # memoized; clustering is idempotent to duplicate edges.
        # Downstream edge consumers must drop_duplicates themselves.
        return pairs

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (t["left_id"].to_numpy(zero_copy_only=False).astype("uint64")
                 * np.uint64(0x9E3779B97F4A7C15)
                 ^ t["right_id"].to_numpy(zero_copy_only=False).astype("uint64"))
        return t.append_column("pair_bucket", pa.array(_bucket_of(h, buckets)))

    rebucketed = (pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
                  .repartition(shuffle_partitions(keys_size_bytes)))
    return rebucketed.groupby("pair_bucket").map_groups(
        lambda g: _dedup_pairs_bucket_arrow(g.drop(["pair_bucket"])),
        batch_format="pyarrow")
