"""Text-analysis pipelines over a documents table (training-data ops):
language ID, quality scoring, token counting, fingerprinting — each a
single vectorized ``map_batches`` stage (stateless tasks) plus small
aggregates.  SQL-expressible projections keep DuckDB-oracle-compatible
column names.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from address_address_matching_ray.functions import textstats


def annotate_text(docs_ds, text_col: str = "text"):
    """documents → + lang_pred, quality features, token counts,
    fingerprint (one pass, all vectorized)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["lang_pred"] = textstats.detect_language(df[text_col])
        feats = textstats.quality_features(df[text_col])
        for c in feats.columns:
            out[c] = feats[c].to_numpy()
        out["n_tokens"] = textstats.token_count(df[text_col], "whitespace")
        out["n_tokens_bpe"] = textstats.token_count(df[text_col], "bpe_ish")
        out["fingerprint"] = textstats.fingerprint(df[text_col])
        return out

    return docs_ds.map_batches(f, batch_format="pandas")


def token_stats(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc whitespace token & char counts (SQL-oracle friendly)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "n_tokens": textstats.token_count(df[text_col], "whitespace"),
            "text_chars": df[text_col].fillna("").str.len().astype("int64"),
        })

    return docs_ds.map_batches(f, batch_format="pandas")


def lang_distribution(docs_ds, lang_col: str = "lang"):
    """groupby(lang).count() — A2-style distribution."""
    return (docs_ds.groupby(lang_col).count()
            .map_batches(lambda t: t.rename_columns([lang_col, "n_docs"]).replace_schema_metadata(None),
                         batch_format="pyarrow"))


def word_frequencies(docs_ds, text_col: str = "text", top_k: int = 50,
                     buckets: int = 64):
    """Corpus word frequencies: per-batch partial counts (combiner) →
    bucketed sum + per-bucket top-k → tiny global merge.

    The naive ``groupby("word").aggregate(Sum)`` creates one group per
    DISTINCT word — millions of tiny groups at corpus scale, the
    Python-per-group finalize trap.  Each word lives wholly in one hash
    bucket, so per-bucket top-k then a global merge is exact."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = (df[text_col].fillna("").str.lower().str.split().explode())
        vc = s.value_counts()
        out = pd.DataFrame({"word": vc.index.astype(str),
                            "cnt": vc.to_numpy().astype("int64")})
        h = pd.util.hash_array(out["word"].to_numpy(dtype=object))
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        return out

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        sums = g.groupby("word", sort=False)["cnt"].sum().reset_index()
        sums = sums.sort_values(["cnt", "word"], ascending=[False, True],
                                kind="mergesort").head(top_k)
        return pd.DataFrame({"word": sums["word"].to_numpy(dtype=object),
                             "n": sums["cnt"].to_numpy()})

    agg = (docs_ds.map_batches(partial, batch_format="pandas")
           .groupby("_b").map_groups(
               lambda g: bucket_topk(g.drop(columns=["_b"])),
               batch_format="pandas"))
    return agg.sort(["n", "word"], descending=[True, False]).limit(top_k)


def doc_repetition(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition quality stats per document (Rae et al.
    2021 §A1.1 "repetition" filters, word-level): total words,
    duplicate-word fraction (1 − distinct/total) and top-word fraction
    (count of the most frequent word / total).  Web-crawl dedup
    pipelines drop docs above thresholds on these BEFORE the expensive
    near-dup stages.

    Fully vectorized per batch: explode → factorize → one ``np.unique``
    over packed (row, word) codes → ``reduceat`` per row.  Empty /
    whitespace-only docs are excluded (same as the SQL oracle's
    ``WHERE trim(text) <> ''``).
    """
    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df[text_col].fillna("").str.lower().str.strip().str.split()
        lengths = toks.str.len().fillna(0).astype("int64").to_numpy()
        ex = toks.explode()
        ex = ex[ex.notna()]
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype=df[id_col].dtype),
            "n_words": pd.Series([], dtype="int64"),
            "dup_word_frac": pd.Series([], dtype="float64"),
            "top_word_frac": pd.Series([], dtype="float64")})
        if len(ex) == 0:
            return empty
        rows = ex.index.to_numpy(dtype=np.int64)
        codes, uniq = pd.factorize(ex.to_numpy())
        # pack (row, word) into one int64 key; np.unique sorts it
        # row-major, so per-row runs are contiguous for reduceat
        key = rows * np.int64(len(uniq)) + codes
        uk, cnt = np.unique(key, return_counts=True)
        docs_of = uk // np.int64(len(uniq))
        starts = np.flatnonzero(np.diff(docs_of, prepend=-1))
        n_distinct = np.diff(np.append(starts, len(docs_of)))
        top = np.maximum.reduceat(cnt, starts)
        present = docs_of[starts]
        total = lengths[present].astype(np.float64)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[present],
            "n_words": lengths[present],
            "dup_word_frac": np.round(1.0 - (n_distinct / total), 6),
            "top_word_frac": np.round(top / total, 6)})

    return docs_ds.map_batches(f, batch_format="pandas")


def approx_word_frequencies(docs_ds, text_col: str = "text",
                            top_k: int = 50, k: int = 4096):
    """Approximate corpus top words via mergeable Misra-Gries summaries
    (``functions/sketch.py:mg_*``): each batch contributes at most
    ``k`` counter rows regardless of vocabulary size — the bounded-
    state alternative to ``word_frequencies``' per-word shuffle when
    the vocabulary itself is web-scale.  Counts are lower bounds that
    undercount by ≤ N_words/(k+1); every word more frequent than that
    is guaranteed present.  With fewer than ``k`` distinct words the
    summary is EXACT (the sf0.01 oracle regime).

    Merge topology: slim ≤k-row partials stream to the driver and fold
    left — same associative combine a tree/shuffle merge would use, so
    the driver holds O(k) state, never the vocabulary.
    """
    from address_address_matching_ray.functions import sketch as sk

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").str.lower().str.split().explode()
        vc = s.dropna().value_counts()
        keys, counts = sk.mg_prune(vc.index.to_numpy(dtype=object),
                                   vc.to_numpy().astype("int64"), k)
        return pd.DataFrame({"word": keys.astype(str),
                             "cnt": counts.astype("int64")})

    parts = docs_ds.map_batches(partial, batch_format="pandas")
    keys = np.array([], dtype=object)
    counts = np.array([], dtype="int64")
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        keys = np.concatenate([keys, b["word"].to_numpy(dtype=object)])
        counts = np.concatenate([counts, b["cnt"].to_numpy()])
        keys, counts = sk.mg_merge(keys, counts, k)

    out = pd.DataFrame({"word": keys.astype(str), "n": counts})
    return (out.sort_values(["n", "word"], ascending=[False, True],
                            kind="mergesort")
            .head(top_k).reset_index(drop=True))
