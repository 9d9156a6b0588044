"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship record-linkage pipeline on synthetic
Common-Crawl-style pages (deterministic, seeded — the BASELINE.json
``input_hint`` shape) sized from sf0.001.  ``queries()`` exposes one
callable per implemented operator family from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible one (fuzzy scoring / clustering / sketch-based ops get
rows-only checks; the pytest suite carries their correctness gates).

Ray is initialised by the driver BEFORE this module is imported — no
``ray.init``/``ray.shutdown`` anywhere in the library.

NOTE: Ray worker processes must be able to import
``address_address_matching_ray`` — run with the repo root as cwd (the
driver does) or on PYTHONPATH; the driver-side sys.path is not
propagated to workers.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_SEED = 42


def _n_pages_for(sf_dir: str) -> int:
    """Deterministic synthetic-pages row count derived from the sf dir
    (documents table size × 4, clamped)."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return max(800, min(4 * n_docs, 200_000))


def _pages(sf_dir: str):
    from address_address_matching_ray.sources.synth import synth_pages

    return synth_pages(_n_pages_for(sf_dir), seed=_SEED)


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: pages → extract → block →
    score → cluster; returns the clusters Dataset."""
    from address_address_matching_ray.pipelines.linkage import run_linkage

    sf_dir = "/root/testdata/sf0.001"
    res = run_linkage(_pages(sf_dir), buckets=16, num_partitions=4)
    return res.clusters


# ──────────────────────────────────────────────────────────────
# queries
# ──────────────────────────────────────────────────────────────

def _docs(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import read

    return read(sf_dir, "documents")


def _emb(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import read

    return read(sf_dir, "embeddings")


def _q_linkage_clusters(sf_dir: str):
    from address_address_matching_ray.pipelines.linkage import run_linkage

    return run_linkage(_pages(sf_dir), buckets=16, num_partitions=4).clusters


def _q_linkage_edges(sf_dir: str):
    from address_address_matching_ray.pipelines.linkage import run_linkage

    res = run_linkage(_pages(sf_dir), buckets=16, num_partitions=4)
    edges = res.edges.filter(expr="accepted == True").select_columns(
        ["left_id", "right_id", "tier", "confidence", "similarity", "exact"])
    # edges may hold one row per (pair, blocking key); unique pairs here
    return (edges.to_pandas()
            .drop_duplicates(["left_id", "right_id"])
            .sort_values(["left_id", "right_id"]).reset_index(drop=True))


def _q_extracted(sf_dir: str):
    from address_address_matching_ray.stages.extract import extract_stage

    return extract_stage(_pages(sf_dir)).select_columns(
        ["doc_id", "url", "addr", "norm_addr", "house", "street_name",
         "unit", "city", "state", "zip"])


def _q_exact_dedup(sf_dir: str):
    from address_address_matching_ray.pipelines.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir)).sort("doc_id")


def _q_minhash_dedup(sf_dir: str):
    from address_address_matching_ray.pipelines.dedup import minhash_dedup

    return minhash_dedup(_docs(sf_dir)).sort("doc_id")


def _q_simhash_dedup(sf_dir: str):
    from address_address_matching_ray.pipelines.dedup import simhash_dedup

    return simhash_dedup(_docs(sf_dir)).sort("doc_id")


def _q_ngram_dedup(sf_dir: str):
    from address_address_matching_ray.pipelines.dedup import ngram_jaccard_dedup

    return ngram_jaccard_dedup(_docs(sf_dir)).sort("doc_id")


def _q_embedding_dedup(sf_dir: str):
    from address_address_matching_ray.pipelines.similarity import embedding_dedup

    return embedding_dedup(_emb(sf_dir)).select_columns(["vec_id", "label"]).sort("vec_id")


def _query_vectors(sf_dir: str, k: int = 3):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, k)
    return np.stack([np.asarray(v, dtype="float32")
                     for v in t["embedding"].to_pylist()])


def _q_ann_topk(sf_dir: str):
    from address_address_matching_ray.pipelines.similarity import brute_force_topk

    out = brute_force_topk(_emb(sf_dir), _query_vectors(sf_dir), k=5)
    return out.select_columns(["query_idx", "vec_id", "rank"]).sort(
        ["query_idx", "rank"])


def _q_ann_ivf(sf_dir: str):
    from address_address_matching_ray.pipelines.similarity import ivf_topk

    out = ivf_topk(_emb(sf_dir), _query_vectors(sf_dir), k=5,
                   n_centroids=16, nprobe=6)
    return out.select_columns(["query_idx", "vec_id", "rank"]).sort(
        ["query_idx", "rank"])


def _q_ann_lsh(sf_dir: str):
    from address_address_matching_ray.pipelines.similarity import lsh_topk

    out = lsh_topk(_emb(sf_dir), _query_vectors(sf_dir), k=5, bits=6)
    return out.select_columns(["query_idx", "vec_id", "rank"]).sort(
        ["query_idx", "rank"])


def _q_token_stats(sf_dir: str):
    from address_address_matching_ray.pipelines.text import token_stats

    return token_stats(_docs(sf_dir)).sort("doc_id")


def _q_lang_dist(sf_dir: str):
    from address_address_matching_ray.pipelines.text import lang_distribution

    return lang_distribution(_docs(sf_dir)).sort("lang")


def _q_word_freq(sf_dir: str):
    from address_address_matching_ray.pipelines.text import word_frequencies

    return word_frequencies(_docs(sf_dir), top_k=50)


def _q_text_annotate(sf_dir: str):
    from address_address_matching_ray.pipelines.text import annotate_text

    return annotate_text(_docs(sf_dir)).select_columns(
        ["doc_id", "lang_pred", "n_tokens", "quality", "fingerprint"]).sort("doc_id")


def _q_normalize_docs(sf_dir: str):
    import pandas as pd
    from address_address_matching_ray.functions.normalize import normalize_series

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "norm_text": normalize_series(df["text"])})

    return _docs(sf_dir).map_batches(f, batch_format="pandas").sort("doc_id")


def _q_lineitem_agg(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import lineitem_agg

    return lineitem_agg(sf_dir)


def _q_events_windowed(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import events_windowed

    return events_windowed(sf_dir)


def _q_top_users(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import top_users

    return top_users(sf_dir)


def _q_segment_revenue(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import segment_revenue

    return segment_revenue(sf_dir)


def _q_nation_orders(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import nation_order_counts

    return nation_order_counts(sf_dir)


def _q_order_priority(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import (
        order_priority_distribution,
    )

    return order_priority_distribution(sf_dir)


def _q_distinct_events(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import distinct_event_types

    return distinct_event_types(sf_dir)


def _q_sessions(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import user_sessions

    return user_sessions(sf_dir)


def _q_match_queries(sf_dir: str):
    """The reference's primary API shape: free-text queries vs an
    address-records table (round-trip self-match, U:1656 analog)."""
    import pyarrow as pa
    import ray.data as rd
    from address_address_matching_ray.pipelines.matching import match_queries
    from address_address_matching_ray.sources.records import (
        fixture_records_table, synth_records,
    )

    records = rd.from_arrow(fixture_records_table()).union(
        synth_records(400, seed=_SEED)).materialize()
    rec_pdf = records.select_columns(["pid", "ADDRESS"]).to_pandas()
    rec_pdf = rec_pdf.sort_values("pid").head(200)
    queries = rd.from_arrow(pa.table({
        "query_id": pa.array(range(len(rec_pdf)), pa.uint64()),
        "query": pa.array(rec_pdf["ADDRESS"].tolist(), pa.string())}))
    out = match_queries(queries, records, buckets=8)
    return out.select_columns(
        ["query_id", "pid", "confidence", "match_level", "reliability"]).sort("query_id")


def _q_media_decode(sf_dir: str):
    from address_address_matching_ray.pipelines.multimodal import (
        decode_stage, synth_media,
    )

    return decode_stage(synth_media(300, seed=_SEED)).select_columns(
        ["media_id", "kind", "n_bytes", "byte_mean"]).sort("media_id")


def _q_media_frames(sf_dir: str):
    from address_address_matching_ray.pipelines.multimodal import (
        frame_sample_stage, synth_media,
    )

    return frame_sample_stage(synth_media(120, seed=_SEED)).sort(
        ["media_id", "frame_ts_ms"])


def _q_customers_without_orders(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import (
        customers_without_orders,
    )

    return customers_without_orders(sf_dir)


def _q_parts_by_brand(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import parts_by_brand

    return parts_by_brand(sf_dir)


def _q_region_supplier_balance(sf_dir: str):
    from address_address_matching_ray.pipelines.relational import (
        region_supplier_balance,
    )

    return region_supplier_balance(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship linkage (north rule) — rows-only (fuzzy + transitive)
        "linkage_clusters": _q_linkage_clusters,
        "linkage_edges": _q_linkage_edges,
        "extract_parse": _q_extracted,
        # dedup family
        "exact_dedup": _q_exact_dedup,
        "minhash_dedup": _q_minhash_dedup,
        "simhash_dedup": _q_simhash_dedup,
        "ngram_dedup": _q_ngram_dedup,
        "embedding_dedup": _q_embedding_dedup,
        # similarity search
        "ann_topk": _q_ann_topk,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        # text analysis
        "token_stats": _q_token_stats,
        "lang_distribution": _q_lang_dist,
        "word_frequencies": _q_word_freq,
        "text_annotate": _q_text_annotate,
        "normalize_docs": _q_normalize_docs,
        # relational / windowed
        "lineitem_agg": _q_lineitem_agg,
        "events_windowed": _q_events_windowed,
        "top_users": _q_top_users,
        "segment_revenue": _q_segment_revenue,
        "nation_orders": _q_nation_orders,
        "order_priority": _q_order_priority,
        "distinct_events": _q_distinct_events,
        "user_sessions": _q_sessions,
        "customers_without_orders": _q_customers_without_orders,
        "parts_by_brand": _q_parts_by_brand,
        "region_supplier_balance": _q_region_supplier_balance,
        "match_queries": _q_match_queries,
        # multimodal plumbing (deterministic fake decode)
        "media_decode": _q_media_decode,
        "media_frames": _q_media_frames,
    }


# ──────────────────────────────────────────────────────────────
# oracle SQL (DuckDB) — column names match the Ray results exactly
# ──────────────────────────────────────────────────────────────

def _normalize_sql() -> str:
    from address_address_matching_ray.functions.normalize import _ABB_ORDER

    expr = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9_\\s#/-]', ' ', 'g'), '\\s+', ' ', 'g'))"
    for full, abbr in _ABB_ORDER:
        expr = f"regexp_replace({expr}, '\\b{full}\\b', '{abbr}', 'g')"
    expr = (f"regexp_replace({expr}, "
            "'\\b(\\d+)[-_]?(st|nd|rd|th|ht|tt|thh|ndd|rdd|h|t)\\b', '\\1', 'g')")
    return f"SELECT doc_id, {expr} AS norm_text FROM documents ORDER BY doc_id"


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup": """
            SELECT doc_id, text, lang, source, n_chars, n_dups FROM (
              SELECT d.*, count(*) OVER (PARTITION BY norm) AS n_dups,
                     row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
              FROM (SELECT *, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
                    FROM documents) d)
            WHERE rn = 1 ORDER BY doc_id""",
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_idx, embedding FROM embeddings WHERE vec_id < 3)
            SELECT query_idx, vec_id, rank FROM (
              SELECT q.query_idx, e.vec_id,
                     row_number() OVER (
                       PARTITION BY q.query_idx
                       ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                                e.vec_id) AS rank
              FROM q CROSS JOIN embeddings e)
            WHERE rank <= 5 ORDER BY query_idx, rank""",
        "token_stats": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                   length(text) AS text_chars
            FROM documents ORDER BY doc_id""",
        "lang_distribution": """
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang""",
        "word_frequencies": """
            SELECT word, count(*) AS n FROM (
              SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
              FROM documents)
            WHERE word <> '' GROUP BY word
            ORDER BY n DESC, word LIMIT 50""",
        "normalize_docs": _normalize_sql(),
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
            ORDER BY c_custkey""",
        "parts_by_brand": """
            SELECT p_brand, count(*) AS n_parts,
                   round(avg(p_retailprice), 4) AS avg_price
            FROM part GROUP BY p_brand ORDER BY p_brand""",
        "region_supplier_balance": """
            SELECT r.r_name, round(sum(s.s_acctbal), 2) AS total_acctbal,
                   count(*) AS n_suppliers
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name ORDER BY r.r_name""",
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
                   round(avg(l_discount), 8) AS avg_disc,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        "events_windowed": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
            ORDER BY event_type, window_start""",
        "top_users": """
            SELECT user_id, round(sum(value), 4) AS total_value, count(*) AS n_events
            FROM events GROUP BY user_id
            ORDER BY total_value DESC, user_id LIMIT 20""",
        "segment_revenue": """
            SELECT c_mktsegment, round(sum(o_totalprice), 2) AS total_revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        "nation_orders": """
            SELECT n_name, count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name""",
        "order_priority": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "distinct_events": """
            SELECT event_type, count(*) AS n FROM events
            GROUP BY event_type ORDER BY event_type""",
        "user_sessions": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM g)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    }
