"""Graph operators: distributed connected components as an ORACLED
query surface.

The engine's transitive-closure machinery (``stages.cluster`` — the
reference's cluster-merge step, U:1239-1303; SURVEY §2.8 J4) is
exercised end-to-end by the flagship linkage pipeline, but its
CORRECTNESS check is rows-only: LSH candidate generation is not
SQL-expressible, so no DuckDB oracle can follow the full path.  This
module closes that gap from the other side: it derives a
deterministic, SQL-expressible graph from the ``events`` table and
runs the SAME distributed CC kernel over it, so DuckDB's recursive
CTE can verify the transitive semantics bit-for-bit.

Graph definition (chosen so both sides are exact and the closure is
cheap to oracle):

* nodes  U = users whose total event count is divisible by
  ``modulus`` (a data-dependent predicate — the query really reads
  the table);
* edges  E = {(u, u+1) : u ∈ U and u+1 ∈ U}.

Components are therefore runs of consecutive qualifying user ids —
geometric sizes (mean ≈ modulus/(modulus−1)) so the oracle's
recursive closure stays tiny, while the Ray side still exercises the
full distributed pipeline: bucketed per-user count aggregation, a
membership join to build edges, ``connected_components`` (driver
union-find below threshold, hash-partitioned min-label fixpoint
above), and singleton attachment.

Shape at 100 TB: per-user counts pre-aggregate inside ``map_batches``
before ONE bucket shuffle; the edge build is one membership join over
slim 16-byte rows; CC ships only (u64, u64) pairs.  The text/value
columns never move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from address_address_matching_ray.pipelines.join import membership_join
from address_address_matching_ray.stages.cluster import connected_components

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _user_counts(events_ds, buckets: int):
    """events → (user_id, n) with exact global counts.

    Per-batch ``value_counts`` partials (≤ distinct-users-per-batch
    rows leave each task) → one hash-bucket shuffle → per-bucket sum.
    ``groupby(user_id)`` directly would make one Ray group per user —
    unbounded tiny groups at scale (same argument as
    ``relational.top_users``).
    """

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        users, counts = np.unique(uid, return_counts=True)
        with np.errstate(over="ignore"):
            b = ((users.astype("uint64") * _MIX) % np.uint64(buckets))
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "n": pa.array(counts.astype("int64")),
            "_b": pa.array(b.astype("int64"))})

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("user_id", sort=False)["n"].sum()
               .reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    return (events_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_b").map_groups(
                lambda g: bucket_sum(g.drop(columns=["_b"])),
                batch_format="pandas"))


def user_graph_components(events_ds, modulus: int = 3, buckets: int = 64):
    """Connected components of the consecutive-qualifying-user graph.

    Returns (user_id, cluster_id) for every node in U, cluster_id =
    min user id of the component — the same label convention as the
    linkage clusterer, checkable by a DuckDB recursive CTE.
    """
    def qualify(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return t.select(["user_id"]).filter(pa.array(n % modulus == 0))

    # nodes/edges are consumed by several downstream branches (edge
    # probe, membership side, singleton anti-join); they are slim
    # id-only datasets bounded by the distinct-user count, so
    # materializing beats recomputing the count aggregation 3×
    nodes = _user_counts(events_ds, buckets).map_batches(
        qualify, batch_format="pyarrow").materialize()

    # candidate edges (u, u+1) for u in U; keep those with u+1 in U —
    # one bucketed membership join over slim rows
    cand = nodes.map_batches(
        lambda t: pa.table({
            "left_id": t["user_id"],
            "right_id": pa.compute.add(t["user_id"], 1)}),
        batch_format="pyarrow")
    edges = membership_join(cand, nodes, id_col="right_id",
                            ids_col="user_id", keep=True,
                            buckets=buckets).materialize()

    labels = connected_components(edges)

    def as_out(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["doc_id"].cast(pa.int64()),
            "cluster_id": t["cluster_id"].cast(pa.int64())})

    labeled = labels.map_batches(as_out, batch_format="pyarrow")

    # singletons: nodes with neither neighbor in U never enter the
    # edge list; attach label = self via an anti membership join
    # against the slim endpoint set
    endpoints = edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays(
            [t["left_id"].combine_chunks().cast(pa.int64()),
             t["right_id"].combine_chunks().cast(pa.int64())])}),
        batch_format="pyarrow")
    singles = membership_join(nodes, endpoints, id_col="user_id",
                              ids_col="node", keep=False,
                              buckets=buckets).map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "cluster_id": t["user_id"]}),
        batch_format="pyarrow")

    return labeled.union(singles).sort("user_id")


def component_size_distribution(events_ds, modulus: int = 3,
                                buckets: int = 64):
    """Cluster-size histogram over the user-graph components — the
    standard post-linkage audit (healthy linkage is dominated by small
    components; a giant component signals a blocking pathology or a
    hot-key bridge).  Two combiner passes over slim label rows: per-
    batch member counts → groupby(cluster).sum makes them global →
    per-batch size histogram partials → groupby(size).sum.  Nothing
    unbounded ever sits on the driver."""
    import pandas as pd

    comp = user_graph_components(events_ds, modulus=modulus,
                                 buckets=buckets)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.groupby("cluster_id").size()
        cid = vc.index.to_numpy(np.uint64)
        return pd.DataFrame({"cluster_id": cid.astype("int64"),
                             "n": vc.to_numpy().astype("int64"),
                             "_b": (cid % np.uint64(buckets))
                             .astype("int64")})

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        # cluster-cardinality keys: a native groupby("cluster_id")
        # would pay Ray's Python-per-distinct-key reduce — hash-bucket
        # and sum vectorized per bucket instead
        return (df.drop(columns=["_b"])
                .groupby("cluster_id", as_index=False)["n"].sum())

    sizes = (comp.map_batches(count_partial, batch_format="pandas")
             .groupby("_b").map_groups(bucket_sum, batch_format="pandas"))

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["n"].value_counts()
        return pd.DataFrame({"size": vc.index.to_numpy().astype("int64"),
                             "n_components": vc.to_numpy()
                             .astype("int64")})

    return (sizes.map_batches(hist_partial, batch_format="pandas")
            .groupby("size").sum("n_components")
            .map_batches(lambda df: df.rename(
                columns={"sum(n_components)": "n_components"}),
                batch_format="pandas")
            .sort("size"))


def bipartite_pagerank(orders_ds, lineitem_ds, *, iters: int = 5,
                       scale: int = 10 ** 12, buckets: int = 64,
                       broadcast_threshold: int = 5_000_000):
    """Integer-arithmetic PageRank over the customer–supplier bipartite
    graph (edge iff the customer's orders contain a lineitem from the
    supplier; edges run BOTH ways so rank propagates multi-hop).

    The iterative distributed graph algorithm the engine was missing:
    power iteration, damping 0.85, ``iters`` rounds.  ALL arithmetic
    is int64 on a ``scale`` grid — ``r0 = scale // n_nodes``,
    per-edge contribution ``r[src] // deg[src]``, update
    ``tele + (85 · Σ contrib) // 100`` with
    ``tele = (15 · (scale // n_nodes)) // 100`` — so per-node sums are
    ORDER-FREE (integer addition commutes exactly; the float version
    would drift ulps per shuffle arrival order) and a DuckDB oracle
    replays every round bit-identically with unrolled CTEs (same
    micro-unit trick as ``winsorized_stats`` / ``fs_em_weights``).
    Dangling nodes cannot exist (symmetric edges ⇒ outdeg ≥ 1);
    leaked floor remainders mean total mass decays slightly per round
    — fine for ranking, documented here.

    Shape at 100 TB: the edge build is one join + one bucketed
    distinct over slim (cust, supp) int rows (text never moves).
    Below ``broadcast_threshold`` nodes — the common case even at
    crawl scale, since nodes ≪ edges — each round is SHUFFLE-FREE:
    one broadcast of the (node, rank//deg) arrays, a dense int64
    scatter-add per Arrow edge block, and a ``Dataset.aggregate``
    tree merge of ≤8·n_nodes-byte vectors.  Above the gate each round
    falls back to one bucketed ``equi_join`` of edges⋈ranks plus one
    bucketed per-dst sum, i.e. O(iters) shuffles over 24-byte rows.
    A production deployment would pin edge and rank partitioning
    across rounds; Ray Data re-shuffles per round — the documented
    cost of iterative algorithms on a stateless streaming executor.

    Node ids: customer c → 2c, supplier s → 2s+1.  Returns
    (node_kind, key, rank) sorted by (node_kind, key).
    """
    import ray

    from address_address_matching_ray.pipelines.join import equi_join

    # ── edges: distinct (cust, supp) via ONE bucketed dedup ────────
    li = lineitem_ds.map_batches(
        lambda t: pa.table({"l_orderkey": t["l_orderkey"],
                            "supp": t["l_suppkey"]}),
        batch_format="pyarrow")
    od = orders_ds.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "cust": t["o_custkey"]}),
        batch_format="pyarrow")
    # orderkey→cust is a unique-key lookup over two int64 columns:
    # below ~50M orders (≈800 MB of sorted arrays — the same gate as
    # linkage's attach_singletons) broadcast it once and probe each
    # lineitem batch with searchsorted — zero join shuffle (the
    # generic bucketed equi_join here cost ~90 s of the 37M-edge
    # measurement's 121 s edge build).  Above the gate, the bucketed
    # shuffle join.
    n_orders = od.count()
    if n_orders <= 50_000_000:
        odf = od.to_pandas()
        okey = odf["o_orderkey"].to_numpy("int64")
        order = np.argsort(okey, kind="stable")
        ref_ord = ray.put((okey[order],
                           odf["cust"].to_numpy("int64")[order]))

        def probe(t: pa.Table) -> pa.Table:
            from address_address_matching_ray.stages.bcast import (
                get_cached,
            )

            ok, cust = get_cached(ref_ord)
            lk = t.column("l_orderkey").to_numpy()
            pos = np.minimum(np.searchsorted(ok, lk), len(ok) - 1)
            hit = ok[pos] == lk        # inner-join semantics
            return pa.table({"cust": cust[pos[hit]],
                             "supp": t.column("supp").to_numpy()[hit]})

        joined = li.map_batches(probe, batch_format="pyarrow")
    else:
        joined = equi_join(li, od, on="l_orderkey",
                           right_on="o_orderkey", buckets=buckets)

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        p = df[["cust", "supp"]].drop_duplicates()
        with np.errstate(over="ignore"):
            b = ((p["cust"].to_numpy("uint64") * _MIX
                  + p["supp"].to_numpy("uint64")) * _MIX
                 % np.uint64(buckets))
        p = p.assign(_b=b.astype("int64"))
        return p

    edges0 = (joined.map_batches(pair_partial, batch_format="pandas",
                                  batch_size=None)
              .groupby("_b").map_groups(
                  lambda g: g.drop(columns=["_b"]).drop_duplicates(),
                  batch_format="pandas"))

    def both_ways(df: pd.DataFrame) -> pa.Table:
        c = df["cust"].to_numpy("int64") * 2
        s = df["supp"].to_numpy("int64") * 2 + 1
        # Arrow blocks: the power iteration re-scans edges every round,
        # and Arrow reads out of plasma are zero-copy where pandas
        # blocks would re-unpickle ~16 B/edge per round.
        return pa.table({"src": np.concatenate([c, s]),
                         "dst": np.concatenate([s, c])})

    edges = edges0.map_batches(both_ways,
                               batch_format="pandas").materialize()

    # ── outdeg per src (bucketed combiner), attached to edges once ──
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.groupby("src", sort=False).size()
        out = pd.DataFrame({"node": vc.index.to_numpy("int64"),
                            "d": vc.to_numpy("int64")})
        with np.errstate(over="ignore"):
            out["_b"] = ((out["node"].to_numpy("uint64") * _MIX)
                         % np.uint64(buckets)).astype("int64")
        return out

    deg = (edges.map_batches(deg_partial, batch_format="pandas",
                                 batch_size=None)
           .groupby("_b").map_groups(
               lambda g: g.drop(columns=["_b"]).groupby(
                   "node", sort=False, as_index=False)["d"].sum(),
               batch_format="pandas")).materialize()
    n_nodes = deg.count()
    r_init = scale // n_nodes
    tele = (15 * r_init) // 100

    # ── power iteration ─────────────────────────────────────────────
    # Per round, every edge needs q[src] = rank[src] // deg[src] — the
    # SAME value for all of a node's out-edges.  Below the broadcast
    # gate the rank state is a dense int64 vector aligned to the
    # sorted node-id array: each round ships ONE (node_sorted, q) pair
    # via ray.put, every edge block scatter-adds its contributions
    # into a dense per-block accumulator (exact int64, order-free) and
    # ``Dataset.aggregate`` tree-merges the ≤8·n_nodes-byte vectors —
    # ZERO shuffles per round (the bucketed per-dst groupby this
    # replaces cost 25–32 s/round of the 37M-edge measurement; the
    # dense reduce is one vector add per edge block).  Symmetric edges
    # guarantee every deg node appears as a dst, so the dense domain
    # equals the join path's per-dst group set exactly.  Above the
    # gate (rank vector too big for one broadcast) we fall back to the
    # bucketed ``equi_join`` of edges⋈ranks + per-dst sum.
    import ray
    import ray.data

    use_bcast = n_nodes <= broadcast_threshold
    if use_bcast:
        from ray.data.aggregate import AggregateFn

        ddf = deg.to_pandas()        # bounded by the broadcast gate
        node_sorted = np.sort(ddf["node"].to_numpy("int64"))
        d_sorted = (ddf.set_index("node")["d"]
                    .loc[node_sorted].to_numpy("int64"))
        r_vec = np.full(n_nodes, r_init, dtype=np.int64)
        for _ in range(iters):
            ref = ray.put((node_sorted, r_vec // d_sorted))

            def acc_block(a, blk) -> np.ndarray:
                from address_address_matching_ray.stages.bcast import (
                    get_cached,
                )

                nodes_s, qv = get_cached(ref)
                src = blk.column("src").to_numpy()
                dst = blk.column("dst").to_numpy()
                c = qv[np.searchsorted(nodes_s, src)]
                if a is None:
                    a = np.zeros(len(nodes_s), dtype=np.int64)
                np.add.at(a, np.searchsorted(nodes_s, dst), c)
                return a

            agg = edges.aggregate(AggregateFn(
                init=lambda k: None,     # None sentinel: never ship a
                merge=lambda a, b: (     # zeros vector, just partials
                    b if a is None else a if b is None else a + b),
                name="s", accumulate_block=acc_block))
            s = agg["s"]
            r_vec = tele + (85 * s) // 100
        rdf = pd.DataFrame({"node": node_sorted, "r": r_vec})
        ranks = ray.data.from_pandas(rdf)
    else:
        ranks = deg.map_batches(
            lambda df: pd.DataFrame({
                "node": df["node"].to_numpy("int64"),
                "r": np.full(len(df), r_init, dtype="int64")}),
            batch_format="pandas")
        ew = equi_join(edges, deg, on="src", right_on="node",
                       buckets=buckets).map_batches(
            lambda df: df.drop(columns=["node"]),
            batch_format="pandas").materialize()

        def new_rank(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby("dst", sort=False, as_index=False)["s"].sum()
            return pd.DataFrame({
                "node": agg["dst"].to_numpy("int64"),
                "r": tele + (85 * agg["s"].to_numpy("int64")) // 100})

        def bucket_partial(out: pd.DataFrame) -> pd.DataFrame:
            with np.errstate(over="ignore"):
                out["_b"] = ((out["dst"].to_numpy("uint64") * _MIX)
                             % np.uint64(buckets)).astype("int64")
            return out

        for _ in range(iters):
            ew_r = equi_join(ew, ranks, on="src", right_on="node",
                             buckets=buckets)

            def contrib(df: pd.DataFrame) -> pd.DataFrame:
                c = (df["r"].to_numpy("int64")
                     // df["d"].to_numpy("int64"))
                return bucket_partial(
                    pd.DataFrame({"dst": df["dst"].to_numpy("int64"),
                                  "s": c})
                    .groupby("dst", sort=False, as_index=False)["s"]
                    .sum())

            ranks = (ew_r.map_batches(contrib, batch_format="pandas",
                                      batch_size=None)
                     .groupby("_b").map_groups(
                         lambda g: new_rank(g.drop(columns=["_b"])),
                         batch_format="pandas")).materialize()

    def as_out(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy("int64")
        return pd.DataFrame({
            "node_kind": np.where(node % 2 == 0, "customer", "supplier"),
            "key": np.where(node % 2 == 0, node // 2, (node - 1) // 2),
            "rank": df["r"].to_numpy("int64")})

    return (ranks.map_batches(as_out, batch_format="pandas")
            .sort(["node_kind", "key"]))
