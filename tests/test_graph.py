"""Graph operators: distributed connected components over the
SQL-expressible consecutive-qualifying-user graph — oracled by a
DuckDB recursive CTE (min-label reachability), plus a forced
distributed-path run and brute-force union-find cross-checks on
synthetic edge shapes."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

GRAPH_SQL = """
    WITH RECURSIVE
    u AS (SELECT user_id FROM events
          GROUP BY user_id HAVING count(*) % 3 = 0),
    e AS (SELECT a.user_id AS l, b.user_id AS r
          FROM u a JOIN u b ON b.user_id = a.user_id + 1),
    ed AS (SELECT l, r FROM e UNION ALL SELECT r AS l, l AS r FROM e),
    reach AS (
      SELECT user_id AS node, user_id AS label FROM u
      UNION
      SELECT ed.l AS node, reach.label AS label
      FROM ed JOIN reach ON reach.node = ed.r)
    SELECT node AS user_id, min(label) AS cluster_id
    FROM reach GROUP BY node ORDER BY user_id"""


def _events():
    from address_address_matching_ray.pipelines.relational import read

    return read(SF, "events", columns=["user_id"])


def _oracle():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    return con.execute(GRAPH_SQL).fetchdf()


def test_graph_components_oracle(ray_session):
    from address_address_matching_ray.pipelines.graph import (
        user_graph_components,
    )

    got = user_graph_components(_events()).to_pandas()
    exp = _oracle().astype({"user_id": "int64", "cluster_id": "int64"})
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))
    # the graph must be non-trivial for the oracle to mean anything
    assert len(got) > 0
    assert (got["cluster_id"] != got["user_id"]).any(), \
        "no multi-node component — predicate degenerated"


def test_cc_distributed_path_matches_driver_path(ray_session):
    """Force the hash-partitioned min-label fixpoint (the 10^12-row
    path) on a chain + cycle + singleton-free graph and compare to a
    brute-force union-find."""
    import ray.data as rd

    from address_address_matching_ray.stages.cluster import (
        connected_components,
    )

    rng = np.random.RandomState(7)
    # 3 shapes: a 40-node chain, an 11-node cycle, random small trees
    chain = [(i, i + 1) for i in range(100, 140)]
    cycle = [(200 + i, 200 + (i + 1) % 11) for i in range(11)]
    parents = rng.randint(0, 50, size=60)
    trees = [(300 + i + 1, 300 + int(parents[i] % (i + 1)))
             for i in range(60)]
    edges = pd.DataFrame(chain + cycle + trees,
                         columns=["left_id", "right_id"]).astype("uint64")

    labels = (connected_components(
        rd.from_pandas(edges), num_partitions=4, driver_threshold=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # brute force
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for l, r in edges.itertuples(index=False):
        a, b = find(int(l)), find(int(r))
        if a != b:
            parent[max(a, b)] = min(a, b)
    exp = pd.DataFrame(
        sorted((n, find(n)) for n in parent),
        columns=["doc_id", "cluster_id"]).astype("uint64")
    pd.testing.assert_frame_equal(
        labels.astype("uint64"), exp, check_dtype=False)


def test_graph_components_all_singletons(ray_session):
    """Predicate that never links neighbors → every node labels
    itself (exercises the singleton attach branch alone)."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.graph import (
        user_graph_components,
    )

    # users spaced 10 apart: no u, u+1 pairs exist; every count is 3
    ev = pd.DataFrame({"user_id": np.repeat(
        np.arange(0, 100, 10, dtype="int64"), 3)})
    got = user_graph_components(rd.from_pandas(ev)).to_pandas()
    assert (got["cluster_id"] == got["user_id"]).all()
    assert len(got) == 10


def test_component_size_distribution(ray_session):
    import duckdb

    import __ray_entry__ as e

    SF = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    got = e.queries()["component_sizes"](SF).to_pandas()
    exp = con.execute(e.oracle_sql()["component_sizes"]).fetchdf()
    a = got[sorted(got.columns)].reset_index(drop=True)
    b = exp[sorted(exp.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                  check_like=True)
    # total members across the histogram == node count of components
    comp = e.queries()["graph_components"](SF).to_pandas()
    assert int((got["size"] * got["n_components"]).sum()) == len(comp)


def test_bipartite_pagerank_structure(ray_session):
    """Planted star: supplier 0 serves EVERY customer, suppliers 1-4
    serve one each → supplier 0 must outrank every other supplier, and
    integer mass is conserved up to the documented floor leak
    (≤ 1 unit per node per round)."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.graph import (
        bipartite_pagerank,
    )

    n_cust = 40
    orders = pd.DataFrame({
        "o_orderkey": np.arange(2 * n_cust, dtype="int64"),
        "o_custkey": np.tile(np.arange(n_cust, dtype="int64"), 2)})
    # order 2i → supplier 0 (the hub); order 2i+1 → supplier 1 + i%4
    li = pd.DataFrame({
        "l_orderkey": np.arange(2 * n_cust, dtype="int64"),
        "l_suppkey": np.where(np.arange(2 * n_cust) < n_cust, 0,
                              1 + np.arange(2 * n_cust) % 4)})
    out = bipartite_pagerank(rd.from_pandas(orders), rd.from_pandas(li),
                             iters=5).to_pandas()
    n_nodes = n_cust + 5
    assert len(out) == n_nodes
    supp = out[out.node_kind == "supplier"].set_index("key")["rank"]
    assert supp.loc[0] > supp.drop(0).max() * 3
    scale = 10 ** 12
    mass = int(out["rank"].sum())
    # floor leak bound: ≤ n_nodes units lost per round in contributions
    # plus ≤ n_nodes per round in the damping divisions, 5 rounds
    assert scale * 0.95 <= mass <= scale
    # the broadcast-lookup and equi_join iteration paths are integer-
    # identical (broadcast_threshold=0 forces the join fallback)
    out2 = bipartite_pagerank(rd.from_pandas(orders), rd.from_pandas(li),
                              iters=5, broadcast_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(out, out2)
