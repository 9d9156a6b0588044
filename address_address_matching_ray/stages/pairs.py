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

from address_address_matching_ray.config import PipelineConfig
from address_address_matching_ray.stages.keys import PAYLOAD_COLS


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


def make_pairs_bucket(df: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """One bucket of key rows → canonical candidate pairs (vectorized;
    the python loop runs only over distinct multi-member blocks)."""
    if not len(df):
        return _empty_pairs()
    df = (df.sort_values(["block_key", "doc_id"], kind="mergesort")
            .drop_duplicates(["block_key", "doc_id"]).reset_index(drop=True))
    keys_arr = df["block_key"].to_numpy(dtype=object)
    starts = np.flatnonzero(np.concatenate([[True], keys_arr[1:] != keys_arr[:-1]]))
    ends = np.concatenate([starts[1:], [len(df)]])
    ids = df["doc_id"].to_numpy(dtype="uint64")
    kinds = df["key_kind"].to_numpy(dtype=object)

    GL, GR, BK, KK, SP, DP = [], [], [], [], [], []
    for s, e in zip(starts, ends):
        n = int(e - s)
        if n < 2:
            continue
        li, ri, dropped = _pair_indices(n, cfg)
        GL.append(s + li)
        GR.append(s + ri)
        BK.append(np.full(len(li), keys_arr[s], dtype=object))
        KK.append(np.full(len(li), kinds[s], dtype=object))
        SP.append(np.full(len(li), min(100.0 / n, 20.0)))
        DP.append(np.full(len(li), dropped, dtype="uint64"))
    if not GL:
        return _empty_pairs()
    gl, gr = np.concatenate(GL), np.concatenate(GR)
    # members are doc_id-sorted within a block → left < right already
    cols = {
        "left_id": ids[gl], "right_id": ids[gr],
        "block_key": np.concatenate(BK), "key_kind": np.concatenate(KK),
        "specificity": np.concatenate(SP), "dropped_pairs": np.concatenate(DP),
    }
    for c in PAYLOAD_COLS:
        vals = df[c].to_numpy(dtype=object)
        cols[f"l_{c}"] = vals[gl]
        cols[f"r_{c}"] = vals[gr]
    out = pd.DataFrame(cols)
    return _dedup_pairs_bucket(out)


def _empty_pairs() -> pd.DataFrame:
    cols = (["left_id", "right_id", "block_key", "key_kind", "specificity",
             "dropped_pairs"]
            + [f"l_{c}" for c in PAYLOAD_COLS] + [f"r_{c}" for c in PAYLOAD_COLS])
    df = pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
    for c in ("left_id", "right_id", "dropped_pairs"):
        df[c] = df[c].astype("uint64")
    df["specificity"] = df["specificity"].astype("float64")
    return df


def _dedup_pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Cross-key pair dedup within a pair-hash bucket (vectorized)."""
    if not len(df):
        return df
    df = df.sort_values(["left_id", "right_id", "specificity", "block_key"],
                        ascending=[True, True, False, True], kind="mergesort")
    return df.drop_duplicates(["left_id", "right_id"], keep="first").reset_index(drop=True)


def _bucket_of(h: np.ndarray, buckets: int) -> np.ndarray:
    return (h % np.uint64(buckets)).astype("int64")


def _find_hot_keys(keys_ds, threshold: int, buckets: int = 64) -> set:
    """Pass 0: keys whose row count exceeds ``threshold``.

    Shape matters: a ``groupby(block_key).sum`` would create millions of
    single-row groups (Python-per-group in the aggregate finalize — it
    measured 570 s on 12M keys).  Instead: project to the bare key
    column, per-batch partial counts (combiner), bucket by
    ``hash(key) % B``, ONE vectorized value_counts per bucket.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["block_key"].value_counts()
        out = pd.DataFrame({"block_key": vc.index.astype(str),
                            "c": vc.to_numpy().astype("int64")})
        h = pd.util.hash_array(out["block_key"].to_numpy(dtype=object))
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        return out

    def hot_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sums = g.groupby("block_key", sort=False)["c"].sum()
        hot = sums[sums > threshold]
        return pd.DataFrame({"block_key": hot.index.astype(str),
                             "n": hot.to_numpy()})

    hot_pdf = (keys_ds.select_columns(["block_key"])
               .map_batches(partial, batch_format="pandas")
               .groupby("_b").map_groups(
                   lambda g: hot_in_bucket(g.drop(columns=["_b"])),
                   batch_format="pandas")
               .to_pandas())
    return set(hot_pdf["block_key"]) if len(hot_pdf) else set()


def pairs_stage(keys_ds, cfg: PipelineConfig | None = None,
                buckets: int = 64, salt_hot: bool = True,
                dedup_cross_key: bool = True):
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
    """
    cfg = cfg or PipelineConfig()

    hot: set = set()
    if salt_hot:
        # pass 0 consumes keys lazily: recomputing the (cheap, stateless)
        # key derivation from the materialized/checkpointed upstream is
        # cheaper than pinning the full key table in the object store
        hot = _find_hot_keys(keys_ds, threshold=8 * cfg.max_block_size,
                             buckets=buckets)

    import ray

    hot_ref = ray.put(hot)
    salt_n = max(2, cfg.salt_buckets)

    def add_key_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        hotset = ray.get(hot_ref)
        if hotset:
            is_hot = df["block_key"].isin(hotset).to_numpy()
            if is_hot.any():
                ids = df["doc_id"].to_numpy(dtype="uint64")
                bridge = df[is_hot & (((ids // salt_n) % salt_n) == 0)].copy()
                bridge["block_key"] = bridge["block_key"] + "#bridge"
                bk = df["block_key"].to_numpy(dtype=object)
                salts = (ids % np.uint64(salt_n)).astype("int64")
                bk[is_hot] = [f"{k}#s{s}" for k, s in
                              zip(bk[is_hot], salts[is_hot])]
                df["block_key"] = bk
                df = pd.concat([df, bridge], ignore_index=True)
        h = pd.util.hash_array(df["block_key"].to_numpy(dtype=object),
                               categorize=False)
        df["key_bucket"] = _bucket_of(h, buckets)
        return df

    bucketed = keys_ds.map_batches(add_key_bucket, batch_format="pandas")
    pairs = bucketed.groupby("key_bucket").map_groups(
        lambda g: make_pairs_bucket(g.drop(columns=["key_bucket"]), cfg),
        batch_format="pandas")

    if not dedup_cross_key:
        # skip shuffle #2: a pair co-blocked under keys in different
        # buckets gets scored more than once (dup factor ~1.2-2x) —
        # cheaper than shuffling the pair table now that scoring is
        # memoized; clustering is idempotent to duplicate edges.
        # Downstream edge consumers must drop_duplicates themselves.
        return pairs

    def add_pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = (df["left_id"].to_numpy(dtype="uint64") * np.uint64(0x9E3779B97F4A7C15)
             ^ df["right_id"].to_numpy(dtype="uint64"))
        df["pair_bucket"] = _bucket_of(h, buckets)
        return df

    rebucketed = pairs.map_batches(add_pair_bucket, batch_format="pandas")
    return rebucketed.groupby("pair_bucket").map_groups(
        lambda g: _dedup_pairs_bucket(g.drop(columns=["pair_bucket"])),
        batch_format="pandas")
