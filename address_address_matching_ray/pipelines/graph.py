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
        return pd.DataFrame({"cluster_id": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    sizes = (comp.map_batches(count_partial, batch_format="pandas")
             .groupby("cluster_id").sum("n"))

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["sum(n)"].value_counts()
        return pd.DataFrame({"size": vc.index.to_numpy().astype("int64"),
                             "n_components": vc.to_numpy()
                             .astype("int64")})

    return (sizes.map_batches(hist_partial, batch_format="pandas")
            .groupby("size").sum("n_components")
            .map_batches(lambda df: df.rename(
                columns={"sum(n_components)": "n_components"}),
                batch_format="pandas")
            .sort("size"))
