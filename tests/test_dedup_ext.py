"""Cluster-view and quantization extensions: minhash dup clusters
(consistency with minhash_dedup's kept set), int8 embedding
quantization (oracle parity lives in __ray_entry__; here the
reconstruction-error bound and degenerate dims)."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


def test_dup_clusters_planted(ray_session):
    from address_address_matching_ray.pipelines.dedup import (
        minhash_dup_clusters,
    )

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on the quiet empty street tonight")
    rows = {
        "doc_id": pd.array([10, 11, 12, 13], dtype="uint64"),
        "text": [base, base.replace("quiet", "silent"),
                 "completely different content about databases and "
                 "distributed query engines at scale",
                 base.replace("rain", "snow")],
    }
    out = (minhash_dup_clusters(_docs_ds(rows), buckets=4)
           .to_pandas())
    assert out.cluster_id.tolist() == [10]
    assert out.n_members.tolist() == [3]


def test_dup_clusters_consistent_with_dedup(ray_session):
    """kept-by-dedup + (members − 1 per cluster) must account for the
    whole corpus: sum(n_members) − n_clusters == dropped."""
    from address_address_matching_ray.pipelines.dedup import (
        minhash_dedup, minhash_dup_clusters,
    )
    from address_address_matching_ray.pipelines.relational import read

    docs = read(SF, "documents", columns=["doc_id", "text"])
    n_total = docs.count()
    kept = minhash_dedup(
        read(SF, "documents", columns=["doc_id", "text"])).count()
    cl = minhash_dup_clusters(
        read(SF, "documents", columns=["doc_id", "text"])).to_pandas()
    dropped = int(cl.n_members.sum() - len(cl))
    assert n_total - kept == dropped
    assert (cl.n_members >= 2).all()


def test_quantize_embeddings_reconstruction(ray_session):
    """Dequantized values are within one quantization step of the
    original; constant dims emit code 0 everywhere."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.similarity import (
        quantize_embeddings,
    )

    rng = np.random.RandomState(3)
    n, d = 64, 8
    m = rng.randn(n, d).astype("float32")
    m[:, 5] = 2.5  # constant dim
    emb = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": [row for row in m]}))
    q = quantize_embeddings(emb).to_pandas()
    assert len(q) == n * d
    piv = q.pivot(index="vec_id", columns="dim_j", values="q").to_numpy()
    assert (piv[:, 5] == 0).all()
    assert piv.min() >= 0 and piv.max() <= 255
    mn = m.astype("float64").min(axis=0)
    mx = m.astype("float64").max(axis=0)
    span = np.where(mx > mn, mx - mn, 1.0)
    deq = mn + (piv + 0.5) * span / 255.0
    err = np.abs(deq - m.astype("float64"))
    ok = np.ones_like(err, dtype=bool)
    ok[:, 5] = True  # constant dim reconstructs exactly via mn
    assert (err[:, np.arange(d) != 5] <= (span / 255.0)[None,
            np.arange(d) != 5] * 1.01).all()
