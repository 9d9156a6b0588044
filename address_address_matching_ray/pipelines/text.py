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
            .map_batches(lambda t: t.rename_columns([lang_col, "n_docs"]),
                         batch_format="pyarrow"))


def word_frequencies(docs_ds, text_col: str = "text", top_k: int = 50):
    """Corpus word frequencies: per-batch partial counts (combiner)
    → small groupby sum → global top-k.  The pre-aggregation keeps the
    shuffle tiny (SURVEY §2.6 guidance)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = (df[text_col].fillna("").str.lower().str.split().explode())
        vc = s.value_counts()
        return pd.DataFrame({"word": vc.index.astype(str), "cnt": vc.to_numpy()})

    from ray.data.aggregate import Sum

    agg = (docs_ds.map_batches(partial, batch_format="pandas")
           .groupby("word").aggregate(Sum("cnt", alias_name="n")))
    return agg.sort(["n", "word"], descending=[True, False]).limit(top_k)
