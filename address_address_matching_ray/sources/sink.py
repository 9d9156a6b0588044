"""Shard-granular resumable Parquet sink.

``CheckpointManager`` (state/checkpoint.py) resumes at STAGE
granularity: a crashed write is recomputed whole.  This sink resumes at
PARTITION granularity — the brief's "failed run skips finished
partitions" contract: output is one directory per key-hash shard
(``<root>/shard=NNN/``), each shard commits atomically (temp file →
rename → ``_SUCCESS.json`` marker carrying a run fingerprint and row
count), and a re-run

1. lists finished markers DRIVER-SIDE before any execution,
2. filters the input to unfinished shards (so the redo shuffles and
   writes only the missing fraction — not merely skips the write), and
3. rewrites only those shards.

Scale shape: the shard column is a hash of a stable key, so shard
membership is deterministic across runs regardless of block layout;
writes happen inside the shard's own ``map_groups`` task (no driver
materialization); markers are O(buckets) tiny JSON files.  On a real
cluster the root must be shared storage (NFS / fuse-mounted object
store) — the same assumption ``Dataset.write_parquet`` makes.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa


def _shard_dir(root: str, shard: int) -> str:
    return os.path.join(root, f"shard={shard:05d}")


def _marker_path(root: str, shard: int) -> str:
    return os.path.join(_shard_dir(root, shard), "_SUCCESS.json")


def finished_shards(root: str, buckets: int, fingerprint: str) -> set[int]:
    """Shards whose marker exists and matches the run fingerprint."""
    done: set[int] = set()
    for b in range(buckets):
        mp = _marker_path(root, b)
        try:
            with open(mp) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if m.get("fingerprint") == fingerprint:
            done.add(b)
    return done


def _shard_of(col: pa.ChunkedArray, buckets: int) -> np.ndarray:
    from address_address_matching_ray.functions.sketch import hash_values

    if pa.types.is_integer(col.type):
        h = hash_values(col.to_numpy(zero_copy_only=False))
    else:
        from pandas.util import hash_array
        h = hash_array(col.to_pandas().to_numpy(dtype=object)).astype(np.uint64)
    return (h % np.uint64(buckets)).astype("int64")


def resumable_write(ds, root: str, *, key_col: str, buckets: int = 64,
                    fingerprint: str = "") -> dict:
    """Write ``ds`` as ``<root>/shard=NNN/part.parquet`` with atomic
    per-shard commit; finished shards (matching ``fingerprint``) are
    pruned from the input before the shuffle.  Returns
    ``{"written": n, "skipped": n, "rows_written": n}``."""
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    done = finished_shards(root, buckets, fingerprint)
    if len(done) == buckets:
        return {"written": 0, "skipped": buckets, "rows_written": 0}
    pending = np.array(sorted(set(range(buckets)) - done), dtype="int64")

    def tag_and_prune(t: pa.Table) -> pa.Table:
        shard = _shard_of(t[key_col], buckets)
        t = t.append_column("_shard", pa.array(shard))
        return t.filter(pa.array(np.isin(shard, pending)))

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_shard"].iloc[0])
        g = g.drop(columns=["_shard"]).reset_index(drop=True)
        d = _shard_dir(root, b)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(d, "part.parquet"))
        with open(_marker_path(root, b) + ".tmp", "w") as f:
            json.dump({"fingerprint": fingerprint, "rows": len(g)}, f)
        os.replace(_marker_path(root, b) + ".tmp", _marker_path(root, b))
        return pd.DataFrame({"shard": [b], "rows": [len(g)]})

    stats = (ds.map_batches(tag_and_prune, batch_format="pyarrow")
             .groupby("_shard")
             .map_groups(write_shard, batch_format="pandas")
             .to_pandas())           # O(buckets) rows — driver-safe
    # an entirely-empty write yields a column-less frame — treat it as
    # "no shard written" rather than KeyError'ing on the missing column
    written_shards = set(stats["shard"]) if len(stats) else set()
    # shards that had no rows produce no group: mark them complete too,
    # else every resume would re-scan for them forever
    for b in pending:
        if int(b) not in written_shards:
            d = _shard_dir(root, int(b))
            os.makedirs(d, exist_ok=True)
            with open(_marker_path(root, int(b)) + ".tmp", "w") as f:
                json.dump({"fingerprint": fingerprint, "rows": 0}, f)
            os.replace(_marker_path(root, int(b)) + ".tmp",
                       _marker_path(root, int(b)))
    return {"written": int(len(pending)), "skipped": int(len(done)),
            "rows_written": int(stats["rows"].sum()) if len(stats) else 0}


def read_back(root: str):
    """Dataset over every committed shard (markers define visibility —
    a torn shard without its marker is invisible, so readers only ever
    see atomically committed data)."""
    import ray.data as rd

    parts = []
    for d in sorted(os.listdir(root)):
        if d.startswith("shard=") and os.path.exists(
                os.path.join(root, d, "_SUCCESS.json")):
            p = os.path.join(root, d, "part.parquet")
            if os.path.exists(p):
                parts.append(p)
    return rd.read_parquet(parts) if parts else rd.from_items([])
