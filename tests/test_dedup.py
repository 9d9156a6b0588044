"""Dedup oracle-variant gates (round 5)."""
def test_minhash_md5_variant_matches_production_and_capfree(ray_session):
    """Round-5 oracle conversion gates: (a) the md5-seam variant drops
    the same documents as the production siphash MinHash at test scale
    (same shingles/permutations/bands — only the two hash functions
    differ, so the planted near-dup structure must resolve the same
    way); (b) the cap-free regime the SQL oracle assumes holds (no
    band block anywhere near _BandCaps.max_block_size)."""
    import ray.data as rd

    from address_address_matching_ray.pipelines.dedup import (
        _md5_minhash_keys,
        minhash_dedup,
        minhash_dedup_md5,
    )
    from address_address_matching_ray.config import PipelineConfig

    sf = "/root/testdata/sf0.001"
    docs = lambda: rd.read_parquet(f"{sf}/documents.parquet")
    a = minhash_dedup(docs()).to_pandas()["doc_id"].sort_values().to_numpy()
    b = (minhash_dedup_md5(docs()).to_pandas()["doc_id"]
         .sort_values().to_numpy())
    assert (a == b).all()

    keyed = docs().map_batches(
        _md5_minhash_keys,
        fn_kwargs={"cfg": PipelineConfig(), "text_col": "text",
                   "id_col": "doc_id"},
        batch_format="pandas").to_pandas()
    max_block = keyed.groupby("band_key").size().max()
    assert max_block < 100, max_block   # _BandCaps.max_block_size = 500
