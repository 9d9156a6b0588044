"""Transitive clustering: distributed connected components over edges.

Iterative hash-partitioned min-label propagation (SURVEY §7.1 step 5;
the reference has no clustering — its best-match-per-query collapses to
this under self-join semantics; BTS/ICDE'24 in PAPERS.md is the
load-balanced refinement if tree depth ever bites):

    labels ← node id
    repeat: label(n) ← min(label(n), min over neighbors' labels)
    until the global label sum stops changing (labels only decrease,
    so an unchanged sum ⇔ a fixpoint — no join needed for the test)

Each iteration is one ``Dataset.join`` (hash shuffle on node id) + one
``groupby().min()``.  Labels are materialized per iteration (they are
one slim row per node — tiny next to the input); iteration count is
bounded by the cluster diameter, which blocking keeps small.

Determinism: cluster id = min doc_id of the component (stable under
retries and partitioning — SURVEY §4.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _project(ds, mapping: dict[str, str]):
    """select+rename as an Arrow map_batches, forcing id columns back to
    uint64 (groupby/join stages re-infer int64; mixed key types break
    ``Dataset.join``).  Portable across block types —
    ``Dataset.rename_columns`` fails on pandas-backed blocks in this
    Ray version."""
    src = list(mapping)
    dst = list(mapping.values())

    def f(t: pa.Table) -> pa.Table:
        t = t.select(src).rename_columns(dst)
        for name in t.column_names:
            if t.schema.field(name).type != pa.uint64():
                t = t.set_column(t.column_names.index(name), name,
                                 pa.compute.cast(t[name], pa.uint64()))
        # pandas-origin blocks carry an unhashable b'pandas' metadata
        # dict that makes downstream shuffles log schema-dedup warnings
        return t.replace_schema_metadata(None)

    return ds.map_batches(f, batch_format="pyarrow")


def connected_components(edges_ds, num_partitions: int = 16,
                         max_iters: int = 25,
                         driver_threshold: int = 100_000_000,
                         assume_unique: bool = False):
    """edges(left_id,right_id) → labels Dataset (doc_id, cluster_id).

    Adaptive: when the edge list fits the driver (≤ ``driver_threshold``
    rows of two uint64s), the slim id pairs are pulled and union-found
    directly.  Round-5 measurement (BASELINE.md): the driver path wins
    at EVERY size that fits memory — 13.7 s at 57M edges (distributed:
    102.8 s) and 38.3 s at 150M edges (distributed: 215.7 s) on one
    32-CPU box — so the threshold guards MEMORY, not a speed
    crossover: 100M edges ≈ 1.6 GB pull, int32 compressed indices are
    valid to 2³¹ edges.  Above the threshold the condense prelude +
    iterative hash-partitioned label propagation run — the ≳2B-edge /
    driver-less regime, where no single machine holds the edge list.
    Both paths produce identical labels (cluster id = min member id);
    a property test asserts it.

    Only edge endpoints appear; isolated docs are attached by
    ``attach_singletons``.
    """
    n_edges = edges_ds.count()
    if n_edges == 0:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            "doc_id": pd.array([], dtype="uint64"),
            "cluster_id": pd.array([], dtype="uint64")}))
    if n_edges <= driver_threshold:
        return _driver_union_find(edges_ds, assume_unique=assume_unique)

    # contraction prelude: two bucketed local union-find rounds shrink
    # dup-/cycle-heavy edge lists geometrically for one slim-pair
    # shuffle each (see ``condense_edges`` — label-identical by the
    # spanning-forest-union argument).  Often the condensed set fits the
    # driver path; otherwise the join fixpoint runs on far fewer rows.
    condensed = condense_edges(edges_ds,
                               buckets=max(2 * num_partitions, 32),
                               num_partitions=num_partitions).materialize()
    n_cond = condensed.count()
    if n_cond == 0:
        # degenerate: every edge was a self-loop
        return _project(edges_ds.select_columns(["left_id"]),
                        {"left_id": "doc_id"}).map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "cluster_id": t["doc_id"]}),
            batch_format="pyarrow")
    if n_cond <= driver_threshold:
        return _driver_union_find(condensed, assume_unique=True)
    edges_ds = condensed

    fwd = _project(edges_ds, {"left_id": "node", "right_id": "nbr"})
    rev = _project(edges_ds, {"right_id": "node", "left_id": "nbr"})
    adj = fwd.union(rev).materialize()

    def min_by_node(ds):
        """(node, cluster_id) rows → one min-label row per node.

        Bucketed: hash(node) % B partitions + ONE vectorized pandas
        groupby-min per bucket.  A plain ``groupby("node").min()``
        makes one Ray group per node — tens of millions of tiny groups
        whose per-group finalize stalled the first iteration for 20+
        minutes at 57M edges."""
        buckets = max(2 * num_partitions, 32)

        def add_b(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False).astype("uint64")
            with np.errstate(over="ignore"):
                h = node * np.uint64(0x9E3779B97F4A7C15)
            return t.append_column(
                "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

        def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
            gm = (g.groupby("node", sort=False)["cluster_id"].min()
                   .reset_index())
            return pd.DataFrame({
                "node": gm["node"].to_numpy(dtype="uint64"),
                "cluster_id": gm["cluster_id"].to_numpy(dtype="uint64")})

        from address_address_matching_ray.stages.pairs import shuffle_partitions

        return (ds.map_batches(add_b, batch_format="pyarrow")
                .repartition(shuffle_partitions())
                .groupby("_b").map_groups(
                    lambda g: bucket_min(g.drop(columns=["_b"])),
                    batch_format="pandas"))

    # initial label = min(self, min neighbor) — first propagation free
    def init_label(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": df["node"].astype("uint64"),
            "cluster_id": np.minimum(df["node"].to_numpy(dtype="uint64"),
                                     df["nbr"].to_numpy(dtype="uint64"))})

    labels = min_by_node(
        adj.map_batches(init_label, batch_format="pandas")).materialize()
    prev_sum = labels.sum("cluster_id")

    for _ in range(max_iters):
        # candidate labels flow across edges: node ← label(nbr)
        cand = adj.join(labels, join_type="inner",
                        num_partitions=num_partitions,
                        on=("nbr",), right_on=("node",),
                        left_suffix="", right_suffix="_r")
        cand = _project(cand, {"node": "node", "cluster_id": "cluster_id"})
        labels = min_by_node(cand.union(labels)).materialize()
        # pointer jump: label(n) ← label(label(n)) — collapses chains
        # exponentially (O(log diameter) rounds total instead of
        # O(diameter)); every label value is itself a labeled node
        # (the min member), so the self-join is total.
        jump = labels.join(labels, join_type="inner",
                           num_partitions=num_partitions,
                           on=("cluster_id",), right_on=("node",),
                           left_suffix="", right_suffix="_r")
        labels = _project(jump, {"node": "node",
                                 "cluster_id_r": "cluster_id"}).materialize()
        cur_sum = labels.sum("cluster_id")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return _project(labels, {"node": "doc_id", "cluster_id": "cluster_id"})


def dedup_edge_pairs(edges_ds, buckets: int = 64):
    """Distributed (left_id, right_id) pair dedup: bucketed shuffle of
    the two slim id columns + one Arrow sort/mask per bucket.  The
    linkage pipeline skips cross-key pair dedup by design (dup factor
    ~2-3×); collapsing duplicates BEFORE edges reach the driver
    union-find moves that work from the serial phase to the cluster."""
    from address_address_matching_ray.stages.pairs import shuffle_partitions

    slim = edges_ds.select_columns(["left_id", "right_id"])

    def add_b(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (t["left_id"].to_numpy(zero_copy_only=False).astype("uint64")
                 * np.uint64(0x9E3779B97F4A7C15)
                 ^ t["right_id"].to_numpy(zero_copy_only=False).astype("uint64"))
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    def dd(t: pa.Table) -> pa.Table:
        t = t.drop(["_b"]).sort_by([("left_id", "ascending"),
                                    ("right_id", "ascending")])
        l = t["left_id"].to_numpy(zero_copy_only=False)
        r = t["right_id"].to_numpy(zero_copy_only=False)
        if len(l) < 2:
            return t
        keep = np.concatenate([[True], (l[1:] != l[:-1]) | (r[1:] != r[:-1])])
        return t.filter(pa.array(keep)) if not keep.all() else t

    return (slim.map_batches(add_b, batch_format="pyarrow")
            .repartition(shuffle_partitions())
            .groupby("_b").map_groups(dd, batch_format="pyarrow"))


def _cc_arrays(left: np.ndarray, right: np.ndarray):
    """Vectorized hook + pointer-jump connected components on raw id
    arrays (the worker-side kernel behind ``condense_edges``; the
    driver path keeps its polars-tuned variant).  Returns
    ``(nodes_sorted, root_per_node)`` — both uint64; root = component's
    minimum id because ``np.unique`` sorts and labels start as indices.
    """
    nodes = np.unique(np.concatenate([left, right]))
    m = len(nodes)
    li = np.searchsorted(nodes, left).astype(np.int64)
    ri = np.searchsorted(nodes, right).astype(np.int64)
    self_ix = np.arange(m, dtype=np.int64)
    src = np.concatenate([li, ri, self_ix])
    dst = np.concatenate([ri, li, self_ix])
    order = np.argsort(src, kind="stable")
    src_s = src[order]
    dst_s = dst[order]
    seg = np.flatnonzero(np.concatenate([[True], src_s[1:] != src_s[:-1]]))
    label = np.arange(m, dtype=np.int64)
    while True:
        prev = label
        label = np.minimum.reduceat(label[dst_s], seg)
        while True:
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(prev, label):
            break
    return nodes, nodes[label]


def condense_edges(edges_ds, buckets: int = 64, rounds: int = 2,
                   num_partitions: int = 16):
    """Bucketed local union-find contraction (star contraction): each
    round hash-partitions the slim (left_id, right_id) pairs by LEFT
    endpoint, runs the vectorized CC kernel per bucket, and emits one
    ``(node → local-min-root)`` star edge per non-root node.

    The union of per-bucket spanning forests has exactly the input's
    connected components (a spanning forest of each edge-subset
    preserves connectivity of that subset, and the union restores the
    rest), so ANY downstream CC on the condensed set yields identical
    labels.  Duplicate, parallel and cyclic edges vanish locally;
    chains that span buckets collapse across rounds
    (pointer-doubling-like).  One cheap slim-pair shuffle per round —
    the prelude that shrinks a >``driver_threshold`` edge list before
    the join-per-iteration fixpoint (or below the threshold entirely,
    onto the driver path)."""
    from address_address_matching_ray.stages.pairs import shuffle_partitions

    cur = edges_ds.select_columns(["left_id", "right_id"])

    def add_b(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (t["left_id"].to_numpy(zero_copy_only=False).astype("uint64")
                 * np.uint64(0x9E3779B97F4A7C15))
        return t.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype("int64")))

    def local_cc(t: pa.Table) -> pa.Table:
        l = t["left_id"].to_numpy(zero_copy_only=False).astype("uint64")
        r = t["right_id"].to_numpy(zero_copy_only=False).astype("uint64")
        nodes, roots = _cc_arrays(l, r)
        keep = nodes != roots                  # roots carry no edge
        return pa.table({
            "left_id": pa.array(nodes[keep], pa.uint64()),
            "right_id": pa.array(roots[keep], pa.uint64()),
        })

    for _ in range(rounds):
        cur = (cur.map_batches(add_b, batch_format="pyarrow")
               .repartition(shuffle_partitions())
               .groupby("_b").map_groups(
                   lambda g: local_cc(g.drop(["_b"])),
                   batch_format="pyarrow"))
    return cur


def _driver_union_find(edges_ds, assume_unique: bool = False):
    """Small-graph path: collect only the two id columns and run a fully
    vectorized hook + pointer-jump connected components (numpy; no
    per-edge Python loop).  ``np.unique`` sorts node ids, so the minimum
    compressed index per component IS the minimum doc_id — the canonical
    label invariant for free."""
    import ray.data as rd

    import polars as pl

    # polars (multi-threaded) for the heavy sorts/uniques: the driver
    # UF is the pipeline's one single-process phase, so its wall time
    # is pure serial residue for the scaling ratio.  numpy's
    # unique(return_inverse=True) alone measured 55 s on 28M ids.
    import ray

    # parallel block fetch (to_arrow_refs + one ray.get) — the
    # sequential iter_batches stream measured ~2.5× slower for the same
    # 5M-edge pull, and this phase is serial residue in the scaling
    # ratio
    blocks = [t.select(["left_id", "right_id"]) for t in ray.get(
        edges_ds.select_columns(["left_id", "right_id"]).to_arrow_refs())
        if t.num_rows]          # empty blocks may carry a degenerate schema
    ids = pl.from_arrow(pa.concat_tables(blocks))
    if not assume_unique:
        # duplicate pairs are mostly collapsed DISTRIBUTED upstream
        # (``dedup_edge_pairs``); a residual unique() here stays cheap.
        # Callers that provably routed through ``dedup_edge_pairs``
        # pass assume_unique=True and skip this serial hash pass.
        ids = ids.unique()
    left = ids["left_id"].to_numpy().astype("uint64", copy=False)
    right = ids["right_id"].to_numpy().astype("uint64", copy=False)
    nodes = (pl.concat([ids["left_id"], ids["right_id"]])
             .unique().sort().to_numpy().astype("uint64", copy=False))
    m = len(nodes)
    # node-id → compressed-index inverse via a multi-threaded polars
    # hash join (a numpy searchsorted over 2E ids was single-thread
    # serial residue in the scaling ratio).  Compressed indices are
    # int32: the driver path is gated at ≤100M edges (≤200M nodes <
    # 2^31), and halving the element width halves the memory traffic of
    # every concat/gather/reduceat below — this phase is pure serial
    # residue in the scaling ratio, so bytes moved ≈ wall time.
    rank = pl.DataFrame({"_id": nodes,
                         "_ix": np.arange(m, dtype=np.int32)})
    inv_df = pl.DataFrame({"_id": np.concatenate([left, right])}) \
        .join(rank, on="_id", how="left")
    inv = inv_df["_ix"].to_numpy().astype(np.int32, copy=False)
    li, ri = inv[: len(left)], inv[len(left):]
    # sorted adjacency (with self-loops so every node owns a segment):
    # the hook step becomes one gather + one ``minimum.reduceat`` —
    # buffered C kernels, ~10× the throughput of unbuffered
    # ``np.minimum.at`` on the same edges.  Order within a segment is
    # irrelevant to a min-reduction, so any sort works; the polars
    # DataFrame sort fuses the parallel sort with the dst gather
    # (arg_sort + two numpy fancy-index gathers measured ~4× slower).
    self_ix = np.arange(m, dtype=np.int32)
    adj = pl.DataFrame({"_s": np.concatenate([li, ri, self_ix]),
                        "_d": np.concatenate([ri, li, self_ix])}).sort("_s")
    src_s = adj["_s"].to_numpy().astype(np.int32, copy=False)
    dst_s = adj["_d"].to_numpy().astype(np.int32, copy=False)
    seg_starts = np.flatnonzero(
        np.concatenate([[True], src_s[1:] != src_s[:-1]]))
    label = np.arange(m, dtype=np.int32)
    while True:
        prev = label
        # hook: label(n) ← min(label(n), min over neighbors' labels);
        # reduceat output is node-ordered because src covers 0..m-1
        label = np.minimum.reduceat(label[dst_s], seg_starts)
        # compress: pointer jumping until stable
        while True:
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(prev, label):
            break
    out = pd.DataFrame({"doc_id": nodes, "cluster_id": nodes[label]})
    return rd.from_pandas(out)


def filter_out_ids(ds, ids_ds, id_col: str = "doc_id",
                   ids_col: str | None = None,
                   broadcast_threshold: int = 5_000_000,
                   num_partitions: int = 16):
    """Scale-safe left-anti semi-join: drop ``ds`` rows whose ``id_col``
    appears in ``ids_ds[ids_col]``.

    Below ``broadcast_threshold`` the id set is broadcast ONCE as a
    sorted numpy array (zero-copy from the object store, searchsorted
    membership test per batch) — never a Python set, whose per-task
    deserialization and driver residency are unbounded at crawl scale.
    Above it, the shared bucketed anti-membership shuffle
    (``pipelines.join.membership_join``, keep=False) — one union
    exchange of probe + slim key rows, no driver materialization, and
    none of ``Dataset.join``'s fixed actor-pool setup cost.  Both
    paths produce identical output; a pytest runs one dedup with
    ``broadcast_threshold=0`` to assert it.
    """
    ids_col = ids_col or id_col
    n = ids_ds.count()
    if n == 0:
        return ds
    if n <= broadcast_threshold:
        import ray

        arr = np.sort(ids_ds.to_pandas()[ids_col].to_numpy(dtype="uint64"))
        ref = ray.put(arr)

        def drop(df: pd.DataFrame) -> pd.DataFrame:
            k = ray.get(ref)
            v = df[id_col].to_numpy(dtype="uint64")
            pos = np.minimum(np.searchsorted(k, v), len(k) - 1)
            return df[k[pos] != v]

        return ds.map_batches(drop, batch_format="pandas")

    from address_address_matching_ray.pipelines.join import membership_join

    return membership_join(ds, ids_ds, id_col=id_col, ids_col=ids_col,
                           keep=False, buckets=max(num_partitions, 16))


def attach_singletons(extracted_ds, labels_ds, num_partitions: int = 16,
                      broadcast_threshold: int = 50_000_000):
    """Left-attach cluster labels to every doc; docs with no accepted
    edge become singleton clusters (cluster_id = own doc_id) — the
    anti-join semantics of SURVEY §2.4.

    Adaptive like ``connected_components``: a small labels table (one
    slim row per *edge endpoint*, usually ≪ docs) is broadcast once via
    ``ray.put`` and applied as a map — no shuffle; a large one goes
    through the hash-partitioned left-outer ``Dataset.join``.

    The 50M-row threshold is two sorted uint64 arrays ≈ 800 MB — one
    shared-memory copy per NODE (zero-copy reads from plasma), cheap
    against the join path, which measured ~20× the broadcast path when
    8M pages first crossed the old 5M cutoff.  Beyond ~50M endpoints
    the broadcast would crowd worker heaps and the join is the honest
    10^9-row shape."""
    docs = extracted_ds.select_columns(["doc_id"])
    n_labels = labels_ds.count()

    if n_labels <= broadcast_threshold:
        import ray

        lab_blocks = [t for t in ray.get(labels_ds.to_arrow_refs())
                      if t.num_rows]
        lab_t = (pa.concat_tables(lab_blocks) if lab_blocks
                 else pa.table({}))
        if lab_t.num_rows and "doc_id" in lab_t.column_names:
            import polars as pl

            # parallel fetch + multi-threaded sort: this broadcast prep
            # is driver-serial, so it shows up 1:1 in the scaling ratio
            lab = pl.from_arrow(lab_t).sort("doc_id")
            keys_arr = lab["doc_id"].to_numpy().astype("uint64", copy=False)
            vals_arr = lab["cluster_id"].to_numpy().astype("uint64", copy=False)
        else:
            keys_arr = np.array([], dtype="uint64")
            vals_arr = np.array([], dtype="uint64")
        # numpy arrays broadcast zero-copy from the object store (a dict
        # would be re-deserialized in every task); lookup = searchsorted
        ref = ray.put((keys_arr, vals_arr))

        def fill_map(df: pd.DataFrame) -> pd.DataFrame:
            k, v = ray.get(ref)
            doc = df["doc_id"].to_numpy(dtype="uint64")
            if len(k):
                pos = np.searchsorted(k, doc)
                pos = np.minimum(pos, len(k) - 1)
                hit = k[pos] == doc
                cid = np.where(hit, v[pos], doc)
            else:
                cid = doc
            return pd.DataFrame({"doc_id": doc,
                                 "cluster_id": cid.astype("uint64")})

        return docs.map_batches(fill_map, batch_format="pandas")

    joined = docs.join(labels_ds, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("doc_id",), right_on=("doc_id",))

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cluster_id"]
        doc = df["doc_id"].astype("uint64")
        return pd.DataFrame({
            "doc_id": doc,
            "cluster_id": cid.fillna(doc).astype("uint64"),
        })

    return joined.map_batches(fill, batch_format="pandas")
