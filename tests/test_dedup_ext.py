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


def test_containment_asymmetry_vs_jaccard(ray_session):
    """A short doc wholly inside a long one: containment flags it
    (cont_lr = 100) while Jaccard stays below the dedup threshold —
    the relation the resemblance family systematically misses."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.dedup import (
        all_pairs_jaccard, containment_pairs,
    )

    short = "alpha beta gamma"
    long = ("alpha beta gamma " +
            " ".join(f"tok{i}" for i in range(60)))
    other = " ".join(f"zzz{i}" for i in range(20))
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="uint64"),
        "text": [short, long, other]}))

    cont = containment_pairs(docs, threshold=80.0).to_pandas()
    assert len(cont) == 1
    row = cont.iloc[0]
    assert (row.left_id, row.right_id) == (1, 2)
    assert row.cont_lr == 100.0          # all of short is inside long
    assert row.cont_rl < 10.0            # long is mostly NOT in short

    jac = all_pairs_jaccard(docs, threshold=70.0).to_pandas()
    assert len(jac) == 0                 # resemblance misses the pair

    # empty-set convention: empty text is contained in anything
    docs2 = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array([1, 2], dtype="uint64"),
        "text": ["", "alpha beta"]}))
    c2 = containment_pairs(docs2, threshold=80.0).to_pandas()
    assert len(c2) == 1 and c2.iloc[0].cont_lr == 100.0


def test_containment_join_exact_vs_bruteforce(ray_session):
    """Prefix filtering is LOSSLESS: on a corpus engineered with
    boundary pairs (overlap exactly ⌈t·|A|⌉) and shared hot tokens,
    the scale join equals the O(n²) surface row-for-row."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.dedup import (
        containment_join, containment_pairs,
    )

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    texts, ids = [], []
    for i in range(120):
        k = int(rng.integers(3, 12))
        texts.append(" ".join(rng.choice(vocab, size=k, replace=False)))
        ids.append(i)
    # boundary pair: |A|=5, overlap=4 → c_lr = 80.0 exactly (a float
    # ceil of 0.8·5 would compute α=5 and silently miss it)
    texts += ["a b c d e", "a b c d zzz qqq rrr sss"]
    ids += [500, 501]
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array(ids, dtype="uint64"), "text": texts}))

    j = (containment_join(docs, threshold=80.0).to_pandas()
         .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    p = (containment_pairs(docs, threshold=80.0).to_pandas()
         .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    assert j[["left_id", "right_id", "cont_lr", "cont_rl"]].equals(p)
    assert (j["dropped_pairs"] == 0).all()
    b = j[(j.left_id == 500) & (j.right_id == 501)]
    assert len(b) == 1 and b.iloc[0].cont_lr == 80.0


def test_containment_join_cap_accounting(ray_session):
    """token_df_cap truncates hot index blocks but never silently:
    emitted pairs carry the per-token drop count."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.dedup import (
        containment_join,
    )

    # every doc = the same 3 tokens → every token has df=40, and every
    # pair is containment-100 both ways
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array(range(40), dtype="uint64"),
        "text": ["x y z"] * 40}))
    full = containment_join(docs, threshold=80.0).to_pandas()
    assert len(full) == 40 * 39 // 2 and (full.dropped_pairs == 0).all()

    capped = containment_join(docs, threshold=80.0,
                              token_df_cap=10).to_pandas()
    assert 0 < len(capped) < len(full)
    assert (capped.dropped_pairs == 30).all()   # df 40 − cap 10


def test_jaccard_join_exact_vs_bruteforce(ray_session):
    """Prefix-filtered Jaccard join is LOSSLESS: equals the O(n²)
    all_pairs_jaccard surface row-for-row on a corpus dense with
    near-threshold pairs (J straddling 70 both ways)."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.dedup import (
        all_pairs_jaccard, jaccard_join,
    )

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(4, 14)),
                                 replace=False)) for _ in range(150)]
    # exact-boundary pair: |A∩B|=7, |A∪B|=10 → J = 70.0 exactly
    texts += ["a b c d e f g h i", "a b c d e f g j"]
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.array(range(len(texts)), dtype="uint64"),
        "text": texts}))

    j = (jaccard_join(docs, threshold=70.0).to_pandas()
         .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    p = (all_pairs_jaccard(docs, threshold=70.0).to_pandas()
         .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    assert j[["left_id", "right_id", "sim"]].equals(p)
    assert (j["dropped_pairs"] == 0).all()
    b = j[(j.left_id == 150) & (j.right_id == 151)]
    assert len(b) == 1 and b.iloc[0].sim == 70.0
