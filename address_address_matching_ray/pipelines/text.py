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


def _bucket_ids(ids: np.ndarray, buckets: int) -> np.ndarray:
    """Doc-id → hash bucket, dtype-general: golden-ratio multiply for
    integer ids (the ``corpus_line_dedup`` convention), siphash via
    ``pd.util.hash_array`` for strings."""
    if np.issubdtype(ids.dtype, np.integer):
        with np.errstate(over="ignore"):
            h = ids.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
    else:
        h = pd.util.hash_array(np.asarray(ids, dtype=object))
    return (h % np.uint64(buckets)).astype("int64")


def tfidf_top_terms(docs_ds, n_docs: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    k: int = 3, max_vocab: int = 50_000_000,
                    buckets: int = 64, force_join: bool = False):
    """Per-doc top-k TF-IDF terms (the corpus keyword-extraction op):
    tf = in-doc count, idf = ln(N/df), score rounded to 1e-6, ties
    broken term-ascending.

    Two passes, both vectorized:

    1. document frequencies — per-batch distinct (doc, term) explode →
       partial term counts (each doc lives wholly in one batch, so
       partials sum exactly) → one groupby; below ``max_vocab`` terms
       the df table is broadcast via ``ray.put``.
    2. fused tf + per-doc top-k inside ONE map_batches call, so a doc's
       terms are never split across tasks and no per-doc shuffle exists.

    Above ``max_vocab`` (real 100-TB webtext vocabularies — typo
    tokens, URLs, code — blow past any broadcast) or under
    ``force_join`` the idf attach switches to the scale path: the
    exploded (doc, term, tf) stream joins the df table inside the term
    hash buckets both sides already carry, then ONE doc-hash bucket
    shuffle co-locates each doc's scored terms for the top-k.  Scores
    are single multiplies (order-free), so both paths emit identical
    rows (path-parity tested with a forced tiny gate).
    """
    import ray

    from address_address_matching_ray.stages.bcast import get_cached

    if n_docs is None:
        n_docs = docs_ds.count()

    def df_batch(df: pd.DataFrame) -> pd.DataFrame:
        ex = (df[text_col].fillna("").str.lower().str.split()
              .explode().dropna())
        pairs = pd.DataFrame({"_r": ex.index.to_numpy(np.int64),
                              "term": ex.to_numpy(object)}).drop_duplicates()
        vc = pairs["term"].value_counts()
        out = pd.DataFrame({"term": vc.index.to_numpy(object),
                            "df": vc.to_numpy().astype("int64")})
        # bucket by term hash — a direct groupby("term") would sort-
        # shuffle the full distinct-term STRING key space (the
        # corpus_line_dedup lesson; webtext vocabularies are ~100M)
        h = pd.util.hash_array(out["term"].to_numpy(object))
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        return out

    dfreq = (docs_ds.map_batches(df_batch, batch_format="pandas")
             .groupby("_b").map_groups(
                 lambda g: g.groupby("term", sort=False, as_index=False)
                 ["df"].sum(),
                 batch_format="pandas")
             # both paths consume dfreq after count(); without this the
             # counting shuffle would run twice
             .materialize())
    n_vocab = dfreq.count()

    if n_vocab <= max_vocab and not force_join:
        dfp = dfreq.to_pandas()
        idf = pd.Series(np.log(n_docs / dfp["df"].to_numpy(np.float64)),
                        index=dfp["term"].to_numpy(object))
        lookup = ray.put(idf)

        def topk_batch(df: pd.DataFrame) -> pd.DataFrame:
            s = get_cached(lookup)
            df = df.reset_index(drop=True)
            ex = (df[text_col].fillna("").str.lower().str.split()
                  .explode().dropna())
            t = pd.DataFrame({"_r": ex.index.to_numpy(np.int64),
                              "term": ex.to_numpy(object)})
            g = (t.groupby(["_r", "term"], sort=False).size()
                 .reset_index(name="tf"))
            g["score"] = np.round(
                g["tf"].to_numpy(np.float64)
                * s.reindex(g["term"].to_numpy(object))
                .to_numpy(np.float64), 6)
            g = g.sort_values(["_r", "score", "term"],
                              ascending=[True, False, True],
                              kind="mergesort")
            top = g.groupby("_r", sort=False).head(k).copy()
            top["rank"] = top.groupby("_r", sort=False).cumcount() + 1
            return pd.DataFrame({
                id_col: df[id_col].to_numpy()[top["_r"].to_numpy()],
                "term": top["term"].to_numpy(object),
                "score": top["score"].to_numpy(),
                "rank": top["rank"].astype("int64").to_numpy()})

        return (docs_ds.map_batches(topk_batch, batch_format="pandas")
                .sort([id_col, "rank"]))

    # --- bucketed-join idf attach (the >max_vocab scale path) ------
    # Shuffle rows are slim: (doc_id, term, tf int64) on the left and
    # the (term, df) vocab shard on the right, both already hashed
    # into the same term buckets; the per-doc top-k then needs exactly
    # one more shuffle keyed on doc-id hash.  idf = ln(n_docs/df) and
    # score = round(tf·idf, 6) are the same scalar expressions as the
    # broadcast path, so outputs are bit-identical.
    # schema probe is metadata-cheap on the read/map lineages these
    # query surfaces feed; the placeholder id on the df side must
    # match the left dtype so the union has one block schema
    _sch = docs_ds.schema()
    id_dtype = np.dtype(dict(zip(_sch.names, _sch.types))[id_col]
                        .to_pandas_dtype())
    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        ex = (df[text_col].fillna("").str.lower().str.split()
              .explode().dropna())
        t = pd.DataFrame({"_r": ex.index.to_numpy(np.int64),
                          "term": ex.to_numpy(object)})
        g = (t.groupby(["_r", "term"], sort=False).size()
             .reset_index(name="tf"))
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy()[g["_r"].to_numpy()],
            "term": g["term"].to_numpy(object),
            "tf": g["tf"].to_numpy().astype("int64")})
        h = pd.util.hash_array(out["term"].to_numpy(object))
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        out["_side"] = np.int64(0)
        return out

    def df_side(df: pd.DataFrame) -> pd.DataFrame:
        if np.issubdtype(id_dtype, np.number):
            pad = np.zeros(len(df), dtype=id_dtype)
        else:
            pad = np.full(len(df), "", dtype=object)
        out = pd.DataFrame({
            id_col: pad,
            "term": df["term"].to_numpy(object),
            "tf": df["df"].to_numpy().astype("int64")})
        h = pd.util.hash_array(out["term"].to_numpy(object))
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        out["_side"] = np.int64(1)
        return out

    def attach_idf(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0]
        right = g[g["_side"] == 1]
        idf = pd.Series(
            np.log(n_docs / right["tf"].to_numpy(np.float64)),
            index=right["term"].to_numpy(object))
        out = pd.DataFrame({
            id_col: left[id_col].to_numpy(),
            "term": left["term"].to_numpy(object),
            "score": np.round(
                left["tf"].to_numpy(np.float64)
                * idf.reindex(left["term"].to_numpy(object))
                .to_numpy(np.float64), 6)})
        out["_d"] = _bucket_ids(out[id_col].to_numpy(), buckets)
        return out

    def doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "score", "term"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby(id_col, sort=False).head(k).copy()
        top["rank"] = (top.groupby(id_col, sort=False).cumcount() + 1
                       ).astype("int64")
        return top[[id_col, "term", "score", "rank"]]

    scored = (docs_ds.map_batches(tf_rows, batch_format="pandas")
              .union(dfreq.map_batches(df_side, batch_format="pandas"))
              .groupby("_b").map_groups(
                  lambda g: attach_idf(g.drop(columns=["_b"])),
                  batch_format="pandas"))
    return (scored.groupby("_d").map_groups(
        lambda g: doc_topk(g.drop(columns=["_d"])),
        batch_format="pandas")
        .sort([id_col, "rank"]))


def bigram_counts(docs_ds, text_col: str = "text", top_k: int = 20,
                  buckets: int = 64):
    """Corpus top-k adjacent-word bigrams — same bucketed combiner
    shape as ``word_frequencies`` (per-batch partial counts, each
    bigram wholly in one hash bucket, per-bucket top-k, tiny global
    merge); the n-gram statistics pass of an LM data pipeline."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = (df[text_col].fillna("").str.lower().str.split()
              .explode().dropna())
        r = ex.index.to_numpy(np.int64)
        w = ex.to_numpy(object)
        if len(w) < 2:
            return pd.DataFrame({"bigram": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype="int64"),
                                 "_b": pd.Series([], dtype="int64")})
        same = r[1:] == r[:-1]          # explode preserves in-doc order
        bg = w[:-1][same] + " " + w[1:][same]
        vc = pd.Series(bg).value_counts()
        out = pd.DataFrame({"bigram": vc.index.to_numpy(object),
                            "cnt": vc.to_numpy().astype("int64")})
        h = pd.util.hash_array(out["bigram"].to_numpy(dtype=object))
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        return out

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        sums = g.groupby("bigram", sort=False)["cnt"].sum().reset_index()
        sums = sums.sort_values(["cnt", "bigram"], ascending=[False, True],
                                kind="mergesort").head(top_k)
        return pd.DataFrame({"bigram": sums["bigram"].to_numpy(object),
                             "n": sums["cnt"].to_numpy()})

    agg = (docs_ds.map_batches(partial, batch_format="pandas")
           .groupby("_b").map_groups(
               lambda g: bucket_topk(g.drop(columns=["_b"])),
               batch_format="pandas"))
    return agg.sort(["n", "bigram"], descending=[True, False]).limit(top_k)


def host_page_counts(pages_ds, top_k: int = 20, buckets: int = 64):
    """Crawl-shaped URL analytics: pages + raw html bytes per host,
    top-k hosts.  Host extraction is one vectorized regex per batch
    over the pruned (url, html) columns; aggregation is the bucketed
    top-k (hosts are ~100M-cardinality at crawl scale — never one Ray
    group per host)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        host = (df["url"].str.extract(r"^[a-z]+://([^/]+)", expand=False)
                .fillna(""))
        nb = df["html"].str.len().fillna(0).astype("int64")
        d = pd.DataFrame({"host": host.to_numpy(object), "nb": nb})
        g = (d.groupby("host", as_index=False, sort=False)
             .agg(n_pages=("nb", "size"), html_bytes=("nb", "sum")))
        g["n_pages"] = g["n_pages"].astype("int64")
        h = pd.util.hash_array(g["host"].to_numpy(dtype=object))
        g["_b"] = (h % np.uint64(buckets)).astype("int64")
        return g

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        sums = (g.groupby("host", sort=False)
                .agg(n_pages=("n_pages", "sum"),
                     html_bytes=("html_bytes", "sum")).reset_index())
        sums["n_pages"] = sums["n_pages"].astype("int64")
        sums["html_bytes"] = sums["html_bytes"].astype("int64")
        return (sums.sort_values(["n_pages", "host"],
                                 ascending=[False, True], kind="mergesort")
                .head(top_k).reset_index(drop=True))

    agg = (pages_ds.map_batches(partial, batch_format="pandas")
           .groupby("_b").map_groups(
               lambda g: bucket_topk(g.drop(columns=["_b"])),
               batch_format="pandas"))
    return agg.sort(["n_pages", "host"], descending=[True, False]).limit(top_k)


def doc_unigram_logprob(docs_ds, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_vocab: int = 50_000_000,
                        buckets: int = 64, force_join: bool = False):
    """Per-doc cross-entropy under the corpus unigram LM (the classic
    cheap LM-quality score): xent = mean over tokens of
    −ln(count(w)/total_words).  Two vectorized passes, both reusing the
    ``word_frequencies`` combiner shape:

    1. corpus term counts (per-batch partials → one groupby) →
       broadcast log-probability table via ``ray.put`` below
       ``max_vocab``;
    2. per-doc token explode + reindex against the worker-cached table,
       ``reduceat`` mean per doc — one map_batches, no per-doc state.

    Above ``max_vocab`` terms (or under ``force_join``) the attach
    switches to the bucketed-join scale path: per-token
    (doc, pos, term) rows join the count table inside the term hash
    buckets both already carry, then ONE doc-hash bucket shuffle
    re-assembles each doc and ``reduceat``s its −log p values sorted
    by the carried token position — the SAME addition order as the
    broadcast path, so xent is bit-identical (path-parity tested with
    a forced tiny gate).  The join path ships one slim row per token
    (~24 B); that is the honest cost of an exact >50M-vocab corpus
    pass and it streams through both shuffles.
    """
    import ray

    from address_address_matching_ray.stages.bcast import get_cached

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = (df[text_col].fillna("").str.lower().str.split()
              .explode().dropna().value_counts())
        out = pd.DataFrame({"term": vc.index.to_numpy(object),
                            "cnt": vc.to_numpy().astype("int64")})
        # term-hash buckets, not a distinct-STRING-key Ray groupby
        # (the corpus_line_dedup lesson)
        h = pd.util.hash_array(out["term"].to_numpy(object))
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        return out

    freq = (docs_ds.map_batches(partial, batch_format="pandas")
            .groupby("_b").map_groups(
                lambda g: g.groupby("term", sort=False, as_index=False)
                ["cnt"].sum(),
                batch_format="pandas")
            # consumed again after count() (to_pandas or join side)
            .materialize())
    n_vocab = freq.count()

    if n_vocab <= max_vocab and not force_join:
        fp = freq.to_pandas()
        total = float(fp["cnt"].sum())
        logp = pd.Series(np.log(fp["cnt"].to_numpy(np.float64) / total),
                         index=fp["term"].to_numpy(object))
        lookup = ray.put(logp)

        def per_doc(df: pd.DataFrame) -> pd.DataFrame:
            lp = get_cached(lookup)
            df = df.reset_index(drop=True)
            ex = (df[text_col].fillna("").str.lower().str.split()
                  .explode().dropna())
            if len(ex) == 0:
                return pd.DataFrame({
                    id_col: pd.Series([], dtype=df[id_col].dtype),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "xent": pd.Series([], dtype="float64")})
            rows = ex.index.to_numpy(np.int64)
            v = -lp.reindex(ex.to_numpy(object)).to_numpy(np.float64)
            starts = np.flatnonzero(np.diff(rows, prepend=-1))
            sums = np.add.reduceat(v, starts)
            n = np.diff(np.append(starts, len(v))).astype("int64")
            present = rows[starts]
            return pd.DataFrame({
                id_col: df[id_col].to_numpy()[present],
                "n_tokens": n,
                "xent": np.round(sums / n, 6)})

        return (docs_ds.map_batches(per_doc, batch_format="pandas")
                .sort(id_col))

    # --- bucketed-join log-prob attach (the >max_vocab scale path) --
    total = float(freq.sum("cnt"))
    _sch = docs_ds.schema()
    id_dtype = np.dtype(dict(zip(_sch.names, _sch.types))[id_col]
                        .to_pandas_dtype())

    def tok_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        ex = (df[text_col].fillna("").str.lower().str.split()
              .explode().dropna())
        rows = ex.index.to_numpy(np.int64)
        if len(rows):
            seg = np.flatnonzero(np.diff(rows, prepend=-1))
            pos = np.arange(len(rows)) - np.repeat(
                seg, np.diff(np.append(seg, len(rows))))
        else:
            pos = np.empty(0, dtype="int64")
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy()[rows],
            # pos carries the doc-local token index on side 0 and the
            # corpus count on side 1 (one shared int64 slot per side)
            "pos": pos.astype("int64"),
            "term": ex.to_numpy(object)})
        h = pd.util.hash_array(out["term"].to_numpy(object))
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        out["_side"] = np.int64(0)
        return out

    def cnt_side(df: pd.DataFrame) -> pd.DataFrame:
        if np.issubdtype(id_dtype, np.number):
            pad = np.zeros(len(df), dtype=id_dtype)
        else:
            pad = np.full(len(df), "", dtype=object)
        out = pd.DataFrame({
            id_col: pad,
            "pos": df["cnt"].to_numpy().astype("int64"),
            "term": df["term"].to_numpy(object)})
        h = pd.util.hash_array(out["term"].to_numpy(object))
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        out["_side"] = np.int64(1)
        return out

    def attach_logp(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0]
        right = g[g["_side"] == 1]
        lp = pd.Series(
            np.log(right["pos"].to_numpy(np.float64) / total),
            index=right["term"].to_numpy(object))
        out = pd.DataFrame({
            id_col: left[id_col].to_numpy(),
            "pos": left["pos"].to_numpy().astype("int64"),
            "v": -lp.reindex(left["term"].to_numpy(object))
            .to_numpy(np.float64)})
        out["_d"] = _bucket_ids(out[id_col].to_numpy(), buckets)
        return out

    def doc_xent(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=g[id_col].dtype),
                "n_tokens": pd.Series([], dtype="int64"),
                "xent": pd.Series([], dtype="float64")})
        g = g.sort_values([id_col, "pos"], kind="mergesort")
        ids = g[id_col].to_numpy()
        v = g["v"].to_numpy(np.float64)
        starts = np.concatenate(
            [[0], np.flatnonzero(ids[1:] != ids[:-1]) + 1])
        sums = np.add.reduceat(v, starts)
        n = np.diff(np.append(starts, len(v))).astype("int64")
        return pd.DataFrame({
            id_col: ids[starts],
            "n_tokens": n,
            "xent": np.round(sums / n, 6)})

    attached = (docs_ds.map_batches(tok_rows, batch_format="pandas")
                .union(freq.map_batches(cnt_side, batch_format="pandas"))
                .groupby("_b").map_groups(
                    lambda g: attach_logp(g.drop(columns=["_b"])),
                    batch_format="pandas"))
    return (attached.groupby("_d").map_groups(
        lambda g: doc_xent(g.drop(columns=["_d"])),
        batch_format="pandas")
        .sort(id_col))


_NG_BASE = np.uint64(1099511628211)


def _flat_ngram_hashes(df: pd.DataFrame, text_col: str, n: int):
    """Batch-vectorized word n-gram rolling hashes, masked at document
    boundaries: ONE ``hash_array`` over the exploded token column and
    one flat polynomial combine — no per-document Python loop.

    Returns ``(ng, od, npos, pos)``: n-gram hash per valid position
    (uint64), owner row index per position, per-row valid-position
    counts, and the 0-based doc-local token offset per valid position.
    Shared by ``duplicate_ngram_coverage`` (corpus-wide dup fraction),
    ``decontaminate`` (benchmark-overlap filtering) and
    ``remove_duplicate_spans`` so all surfaces hash identically.
    """
    toks = df[text_col].fillna("").str.split()
    lengths = toks.str.len().fillna(0).astype("int64").to_numpy()
    npos = np.maximum(lengths - n + 1, 0)
    ex = toks.explode().dropna()
    if len(ex) == 0:
        return (np.empty(0, dtype="uint64"), np.empty(0, dtype="int64"),
                npos, np.empty(0, dtype="int64"))
    h = pd.util.hash_array(ex.to_numpy(object), categorize=False)
    roll = h.copy()
    with np.errstate(over="ignore"):
        for w in range(1, n):
            roll[:-w] = roll[:-w] * _NG_BASE + h[w:]
    # flat position -> doc index; keep positions that do not run past
    # their own document's end
    owner = np.repeat(np.arange(len(df)), lengths)
    starts = np.cumsum(lengths) - lengths
    offs = np.arange(len(h)) - starts[owner]
    valid = offs <= (lengths[owner] - n)
    return roll[valid], owner[valid], npos, offs[valid].astype("int64")


def duplicate_ngram_coverage(docs_ds, n: int = 8, buckets: int = 64,
                             text_col: str = "text", id_col: str = "doc_id"):
    """Cross-document duplicate n-gram coverage (the Gopher §A1.1
    "duplicate n-gram fraction" / Lee et al. 2021 substring-dedup
    diagnostic): for every document, the fraction of its word n-gram
    positions whose n-gram also occurs in at least one OTHER document.
    Crawl pipelines use this to find boilerplate-heavy and
    template-duplicated pages before (or instead of) full substring
    dedup.

    Shape at 100 TB: the corpus leaves the keyer as slim 24-byte
    (hash:u64, doc_id, npos) rows — never the text.  Bucketing by the
    n-gram hash co-locates ALL occurrences of an n-gram in one bucket,
    so the global "seen in ≥2 distinct docs" test is local to the
    bucket; per-bucket output collapses to ≤ one row per (doc, bucket),
    and the final groupby runs over those small partials only.  ONE
    all-to-all over hashed positions, one tiny aggregate.  A 2⁻⁶⁴
    cross-n-gram hash collision at worst marks one extra position
    duplicated (same caveat as the LSH band keys, BASELINE.md).

    Honest volume note: the shuffle ships ~one 24 B row per TOKEN —
    ~2-5× the raw text bytes.  That is the exact-answer floor for one
    pass; when coverage only needs to be approximate (the usual case —
    it feeds a keep/drop threshold), run two cheaper passes instead:
    pass 1 shuffles bare 8 B hashes into bucket-local counters and
    emits only the duplicated-hash set; pass 2 re-keys each doc and
    tests membership against that set (broadcast if it fits, Bloom at
    ~10 bits/entry otherwise — false positives inflate coverage by the
    Bloom fpp, tunable) with NO doc-keyed shuffle at all.

    Fully vectorized across each batch: one ``hash_array`` over the
    exploded token column, one flat rolling polynomial combine that is
    masked at document boundaries — no per-document Python loop.
    """
    mix = np.uint64(0x9E3779B97F4A7C15)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        doc_ids = df[id_col].to_numpy()
        parts = []
        ng, od, npos, _ = _flat_ngram_hashes(df, text_col, n)
        if len(ng) > 0:
            with np.errstate(over="ignore"):
                b = ((ng * mix) % np.uint64(buckets)).astype("int64")
            # npos = -1 marks token rows; totals rows carry >= 0
            parts.append(pd.DataFrame({
                id_col: doc_ids[od], "h": ng,
                "npos": np.full(len(ng), -1, dtype="int64"), "_b": b}))
        with np.errstate(over="ignore"):
            tb = ((pd.util.hash_array(doc_ids) * mix)
                  % np.uint64(buckets)).astype("int64")
        parts.append(pd.DataFrame({
            id_col: doc_ids, "h": np.zeros(len(df), dtype="uint64"),
            "npos": npos, "_b": tb}))
        return pd.concat(parts, ignore_index=True)

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        tok = g[g["npos"] < 0]
        tot = g[g["npos"] >= 0]
        out = [pd.DataFrame({id_col: tot[id_col].to_numpy(),
                             "n_pos": tot["npos"].to_numpy(),
                             "n_dup": np.zeros(len(tot), dtype="int64")})]
        if len(tok) > 0:
            per = tok[["h", id_col]].drop_duplicates()
            ndocs = per.groupby("h", sort=False)["h"].transform("size")
            # n-gram hashes seen in >= 2 distinct docs in the corpus
            dup_h = per.loc[ndocs >= 2, "h"].unique()
            hit = tok.loc[tok["h"].isin(dup_h)]
            cnt = hit.groupby(id_col, sort=False).size()
            out.append(pd.DataFrame({
                id_col: cnt.index.to_numpy(),
                "n_pos": np.zeros(len(cnt), dtype="int64"),
                "n_dup": cnt.to_numpy().astype("int64")}))
        res = pd.concat(out, ignore_index=True)
        # doc-hash bucket for the final reduce: each doc's positions
        # scatter across ~all n-gram buckets, so the per-doc partial
        # table is ~buckets× the corpus — a groupby(doc_id) over it
        # was a sort shuffle with corpus-cardinality keys (~40% of
        # the 255 s 1M-doc wall); 64 numeric groups instead
        with np.errstate(over="ignore"):
            res["_b2"] = ((pd.util.hash_array(res[id_col].to_numpy())
                           * mix) % np.uint64(buckets)).astype("int64")
        return res

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(id_col, sort=False, as_index=False)
               [["n_pos", "n_dup"]].sum())
        np_ = agg["n_pos"].to_numpy("int64")
        nd = agg["n_dup"].to_numpy("int64")
        return pd.DataFrame({
            id_col: agg[id_col], "n_pos": np_, "n_dup": nd,
            "dup_frac": nd.astype("float64") / np.maximum(np_, 1)})

    return (docs_ds.map_batches(emit, batch_format="pandas")
            .groupby("_b").map_groups(
                lambda g: bucket_fn(g.drop(columns=["_b"])),
                batch_format="pandas")
            .groupby("_b2").map_groups(
                lambda g: finish(g.drop(columns=["_b2"])),
                batch_format="pandas")
            .sort(id_col))


def quality_filter(docs_ds, min_words: int = 30, max_words: int = 10_000,
                   max_dup_word_frac: float = 0.82,
                   max_top_word_frac: float = 0.12,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style composite quality gate (Rae et al. 2021 §A1.1):
    keep documents inside the word-count band whose repetition stats
    (``doc_repetition``: duplicate-word and top-word fractions) sit
    below thresholds.  Crawl pipelines run this BEFORE the expensive
    near-dup stages — it is a single embarrassingly-parallel
    ``map_batches`` pass, no shuffle, so it belongs first in the DAG.
    Emits the metrics alongside ``doc_id`` so downstream stages can
    re-threshold without recomputing."""
    metrics = doc_repetition(docs_ds, text_col=text_col, id_col=id_col)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = ((df["n_words"] >= min_words) & (df["n_words"] <= max_words)
             & (df["dup_word_frac"] <= max_dup_word_frac)
             & (df["top_word_frac"] <= max_top_word_frac))
        return df[m].reset_index(drop=True)

    return metrics.map_batches(keep, batch_format="pandas").sort(id_col)


def decontaminate(docs_ds, bench_ds, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  buckets: int = 64,
                  broadcast_threshold: int = 50_000_000):
    """Benchmark decontamination (the n-gram-overlap test every
    training-data pipeline runs before a model sees the corpus —
    Brown et al. 2020 §C, Gopher §A2): flag every corpus document
    that shares at least one word ``n``-gram with the benchmark set,
    so evaluation examples are not trained on.

    Returns (doc_id, n_pos, n_hits, keep) per corpus document —
    ``n_hits`` = number of n-gram POSITIONS whose n-gram occurs in the
    benchmark, ``keep`` = (n_hits == 0).  The metrics ride along so a
    pipeline can re-threshold (e.g. tolerate one collision-prone hit)
    without re-scanning.

    Shape at 100 TB: benchmarks are tiny next to the corpus BY
    DEFINITION (MMLU + friends ≈ millions of n-grams vs trillions of
    corpus tokens), so the benchmark n-gram hash set is collected once
    and broadcast (``ray.put`` of a sorted uint64 array; worker-cached
    via ``stages.bcast``) — the corpus pass is then a shuffle-FREE
    ``map_batches``: each doc lives wholly in one batch, so its
    n_pos/n_hits finish inside that batch.  If the benchmark side
    exceeds ``broadcast_threshold`` distinct hashes (~400 MB at 50M ×
    8 B), the exact fallback is one bucketed ``membership_join`` of
    slim (doc_id, h) rows against the benchmark hashes — one
    all-to-all over 16-byte rows, still no text through the shuffle.

    Hashes are the same masked rolling polynomial as
    ``duplicate_ngram_coverage`` (``_flat_ngram_hashes``): a 2^-64
    collision at worst flags one extra position — same documented
    caveat as the LSH band keys (BASELINE.md).
    """
    from address_address_matching_ray.stages.bcast import get_cached

    def bench_hashes(df: pd.DataFrame) -> pd.DataFrame:
        ng, _, _, _ = _flat_ngram_hashes(df.reset_index(drop=True),
                                      text_col, n)
        return pd.DataFrame({"h": np.unique(ng)})

    bh = bench_ds.map_batches(bench_hashes,
                              batch_format="pandas").materialize()
    n_bench = bh.count()

    if n_bench <= broadcast_threshold:
        import ray

        uniq = np.unique(bh.to_pandas()["h"].to_numpy(dtype="uint64"))
        ref = ray.put(uniq)

        def score(df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            keys = get_cached(ref)
            ng, od, npos, _ = _flat_ngram_hashes(df, text_col, n)
            hits = np.zeros(len(df), dtype="int64")
            if len(ng) > 0 and len(keys) > 0:
                pos = np.minimum(np.searchsorted(keys, ng),
                                 len(keys) - 1)
                np.add.at(hits, od, (keys[pos] == ng).astype("int64"))
            return pd.DataFrame({
                id_col: df[id_col], "n_pos": npos, "n_hits": hits,
                "keep": hits == 0})

        return docs_ds.map_batches(score,
                                   batch_format="pandas").sort(id_col)

    # scale fallback: benchmark too big to broadcast — ship slim
    # (doc_id, h, npos-marker) rows through ONE bucketed membership
    # shuffle; the per-doc totals ride the same union so each bucket
    # emits complete partials (same marker trick as
    # duplicate_ngram_coverage)
    from address_address_matching_ray.pipelines.join import (
        membership_join,
    )

    def corpus_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        ng, od, npos, _ = _flat_ngram_hashes(df, text_col, n)
        doc_ids = df[id_col].to_numpy()
        return pd.concat([
            pd.DataFrame({id_col: doc_ids[od], "h": ng,
                          "npos": np.full(len(ng), -1, dtype="int64")}),
            pd.DataFrame({id_col: doc_ids,
                          "h": np.zeros(len(df), dtype="uint64"),
                          "npos": npos})], ignore_index=True)

    rows = docs_ds.map_batches(corpus_rows, batch_format="pandas")
    tok = rows.map_batches(
        lambda df: df[df["npos"] < 0].reset_index(drop=True),
        batch_format="pandas")
    hits = membership_join(tok, bh, id_col="h", keep=True,
                           buckets=buckets)

    def as_partial(df: pd.DataFrame, hit: bool) -> pd.DataFrame:
        if hit:
            g = df.groupby(id_col, sort=False).size()
            return pd.DataFrame({
                id_col: g.index.to_numpy(), "n_pos": 0,
                "n_hits": g.to_numpy().astype("int64")})
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "n_pos": df["npos"].to_numpy("int64"),
                             "n_hits": np.zeros(len(df), dtype="int64")})

    totals = rows.map_batches(
        lambda df: df[df["npos"] >= 0].reset_index(drop=True),
        batch_format="pandas")
    partials = (hits.map_batches(lambda d: as_partial(d, True),
                                 batch_format="pandas")
                .union(totals.map_batches(
                    lambda d: as_partial(d, False),
                    batch_format="pandas")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["keep"] = df["n_hits"] == 0
        return df

    # per-DOC keys scale with the corpus — bucketed reduce, never the
    # native per-distinct-key aggregate (see join.bucketed_sum)
    from address_address_matching_ray.pipelines.join import bucketed_sum

    return (bucketed_sum(partials, id_col, ["n_pos", "n_hits"])
            .map_batches(finish, batch_format="pandas")
            .sort(id_col))


def bloom_decontaminate(docs_ds, bench_ds, n: int = 8, m_log2: int = 24,
                        k: int = 4, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Bloom-filter benchmark decontamination — the third scale regime
    next to ``decontaminate``'s exact broadcast (≤50M hashes ≈ 400 MB)
    and membership-join paths: a ``2^m_log2``-bit bitmap holds ~1.3
    bits per benchmark n-gram at FP ≈ (k·N/m)^k, so a 500M-n-gram
    benchmark fits a 1 GiB broadcast (m_log2=33) where the exact array
    would need 4 GB — the BFF/Dolma-style production trade (Soldaini
    et al. 2024; Bloom 1970).

    One-sided error BY CONSTRUCTION: every true benchmark n-gram tests
    positive (no false negatives — a contaminated doc is never kept),
    and a false positive can only flag extra positions, so
    ``keep_bloom ⊆ keep_exact`` row-wise.  At the default m_log2=24
    and sf-scale benchmarks (≈10⁵ n-grams) the FP probability per
    position is ~1e-9 — the query surface is verified FP-free against
    the exact oracle, and the pytest gate demonstrates the one-sided
    error at adversarially small ``m_log2``.

    The filter itself is the repo's existing Kirsch–Mitzenmacher
    machinery (``sketch.bloom_*`` — double-hashed positions,
    OR-mergeable, fpp/merge properties gated in ``test_join``) fed the
    SAME rolling n-gram hash as ``decontaminate``, so the corpus pass
    stays a shuffle-free vectorized ``map_batches``.  Build: per-batch
    distinct positions (slim uint64 rows, ≤ k·n-grams) → one driver
    ``np.unique`` bounded like the exact path's hash pull → word array
    built once, ``ray.put`` broadcast, worker-cached.
    """
    import ray

    from address_address_matching_ray.functions.sketch import (
        _bloom_positions, bloom_contains,
    )
    from address_address_matching_ray.stages.bcast import get_cached

    m_words = max(1, (1 << m_log2) >> 6)

    def bench_positions(df: pd.DataFrame) -> pd.DataFrame:
        ng, _, _, _ = _flat_ngram_hashes(df.reset_index(drop=True),
                                      text_col, n)
        if len(ng) == 0:
            return pd.DataFrame({"p": np.empty(0, dtype="uint64")})
        pos = np.concatenate(_bloom_positions(ng, m_words, k))
        return pd.DataFrame({"p": np.unique(pos)})

    uniq = np.unique(bench_ds.map_batches(
        bench_positions, batch_format="pandas").to_pandas()["p"]
        .to_numpy("uint64"))
    words = np.zeros(m_words, dtype=np.uint64)
    np.bitwise_or.at(words, (uniq >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (uniq & np.uint64(63)))
    ref = ray.put(words)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bm = get_cached(ref)
        df = df.reset_index(drop=True)
        ng, od, npos, _ = _flat_ngram_hashes(df, text_col, n)
        hits = np.zeros(len(df), dtype="int64")
        if len(ng) > 0:
            flagged = bloom_contains(bm, ng, k)
            np.add.at(hits, od, flagged.astype("int64"))
        return pd.DataFrame({
            id_col: df[id_col], "n_pos": npos, "n_hits": hits,
            "keep": hits == 0})

    return docs_ds.map_batches(score, batch_format="pandas").sort(id_col)


def pack_sequences(docs_ds, capacity: int = 2000, buckets: int = 16):
    """Deterministic next-fit sequence packing: assign documents to
    fixed-budget bins (``capacity`` chars — stand-in for an LLM
    context-length token budget) so a training loader can concatenate
    each bin into one sample with minimal padding.  Docs are scanned in
    (bucket, doc_id) order; a doc opens a new bin iff it does not fit
    in the current one (a doc larger than ``capacity`` gets a bin of
    its own).  Deterministic across runs, partitionings and resumes:
    bucket = knuth_hash(doc_id) % buckets, scan order = doc_id.

    Scale shape: packing is a sequential prefix scan BY DEFINITION
    (each doc's bin depends on every earlier doc's size), so global
    order cannot parallelize — the buckets are the parallelism unit:
    one independent scan per bucket, each bucket a single task over
    slim (doc_id, n_chars) rows (16 B/row through the shuffle; text
    never moves).  The per-bucket loop is a plain int scan over the
    group — O(rows/buckets) adds per task, not a per-row kernel.
    Oracle: the same recurrence as a DuckDB recursive CTE."""
    def assign_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.uint64)
        with np.errstate(over="ignore"):
            b = (ids * np.uint64(2654435761)) % np.uint64(buckets)
        return df.assign(bucket=b.astype("int64"))

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        sizes = g["n_chars"].to_numpy(np.int64)
        bins = np.empty(len(sizes), dtype=np.int64)
        b, fill = 0, 0
        for i in range(len(sizes)):
            s = int(sizes[i])
            if fill > 0 and fill + s > capacity:
                b, fill = b + 1, s
            else:
                fill += s
            bins[i] = b
        return g.assign(bin=bins)

    return (docs_ds.map_batches(assign_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(pack, batch_format="pandas")
            .sort("doc_id"))


# default scrub rules: the classic PII trio.  Patterns are RE2-safe
# (no backrefs/lookaround) so a SQL engine's regexp_replace agrees.
REDACT_RULES = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
)


def redact_text(ds, col: str, rules=REDACT_RULES, id_col: str = "doc_id",
                keep_cols: tuple = ()):
    """Pattern redaction (PII scrubbing): replace every match of each
    rule's regex with its token, in rule order, and count replacements.
    One vectorized pandas ``str.replace``/``str.count`` pass per rule
    per batch; the patterns compile once on the driver and unpickle
    once per worker (``re.Pattern`` pickles as its compile call), so
    no per-batch compilation.  Stateless tasks, shuffle-free — the
    100-TB shape is exactly this map.  Counts are taken against the
    text as seen by that rule (i.e. after earlier rules ran), matching
    a nested SQL regexp_replace."""
    import re as _re

    compiled = [(_re.compile(p), tok) for p, tok in rules]

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].astype("string")
        n = np.zeros(len(df), dtype=np.int64)
        for rx, tok in compiled:
            n += s.str.count(rx).fillna(0).astype("int64").to_numpy()
            s = s.str.replace(rx, tok, regex=True)
        out = {id_col: df[id_col]}
        for c in keep_cols:
            out[c] = df[c]
        out["redacted"] = s.astype(object)
        out["n_redacted"] = n
        return pd.DataFrame(out)

    return ds.map_batches(f, batch_format="pandas").sort(id_col)


def line_quality_filter(ds, col: str = "text", id_col: str = "doc_id",
                        min_words: int = 5, min_kept_lines: int = 3,
                        terminal: tuple = (".", "!", "?", '"')):
    """C4-style line-level quality filter (Raffel et al. 2020, §2.2):
    split each document on newlines, retain only lines that end in a
    terminal punctuation mark AND have at least ``min_words``
    whitespace words, and keep only documents with at least
    ``min_kept_lines`` surviving lines.  Emits the retained text
    (lines re-joined with newlines, original order) plus line counts
    so the thresholds can be re-tuned without re-running the split.

    Fully vectorized: one pandas ``str.split``/``explode`` pass per
    batch, boolean masks for the two line predicates, and a per-doc
    ``groupby`` join — a document's rows never leave its batch, so
    the op is a stateless shuffle-free map (the 100-TB shape; same
    contract as ``doc_repetition``).  Word counts assume single-space
    separation (``count(' ')+1``), matching the SQL
    ``len(string_split(line, ' '))`` oracle."""
    terminal = tuple(terminal)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        lines = df[col].astype(str).str.split("\n")
        ex = pd.DataFrame({id_col: df[id_col]})
        ex["line"] = lines
        ex = ex.explode("line", ignore_index=True)
        line = ex["line"].astype(str)
        ok = (line.str[-1:].isin(list(terminal))
              & (line.str.count(" ") + 1 >= min_words))
        per_doc = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_lines": lines.str.len().to_numpy().astype("int64")})
        kept = (ex[ok.to_numpy()]
                .groupby(id_col, sort=False)["line"]
                .agg(["\n".join, "size"])
                .rename(columns={"join": "kept_text",
                                 "size": "n_lines_kept"})
                .reset_index())
        out = per_doc.merge(kept, on=id_col, how="inner")
        out["n_lines_kept"] = out["n_lines_kept"].astype("int64")
        out = out[out["n_lines_kept"] >= min_kept_lines]
        return out[[id_col, "kept_text", "n_lines", "n_lines_kept"]]

    return ds.map_batches(f, batch_format="pandas").sort(id_col)


def corpus_line_dedup(ds, col: str = "text", id_col: str = "doc_id",
                      max_freq: int = 5, broadcast_limit: int = 2_000_000,
                      buckets: int = 64, force_join: bool = False):
    """CCNet-style corpus-level line deduplication (Wenzek et al.
    2020 §4.1; RefinedWeb's boilerplate removal): count every line's
    frequency across the corpus and strip lines occurring more than
    ``max_freq`` times — navigation bars, cookie banners, copyright
    footers.  Documents whose every line is boilerplate are dropped.

    Shape: stage 1 is a per-batch ``value_counts`` combiner (partials
    bounded by distinct lines per batch) → one small groupby → the
    frequent-line set, whose cardinality is bounded by the nature of
    boilerplate (each surviving line repeats > max_freq times, so the
    set is ≤ corpus_lines / max_freq and in practice tiny).  Below
    ``broadcast_limit`` frequent lines the strip stage is a
    shuffle-free map (``ray.put`` set + vectorized ``isin`` + in-batch
    reassembly); above it, exploded lines anti-join the frequent set
    by siphash (``pd.util.hash_array``) through the shared
    ``membership_join`` and reassemble in ONE doc-hash bucket shuffle.
    Both paths emit identical results (path-parity test)."""
    import ray

    from address_address_matching_ray.pipelines.join import membership_join

    def count_partials(df: pd.DataFrame) -> pd.DataFrame:
        vc = (df[col].astype(str).str.split("\n").explode()
              .value_counts())
        out = pd.DataFrame({"line": vc.index.astype(object),
                            "n": vc.to_numpy().astype("int64")})
        # bucket by line hash: a groupby("line") directly would make
        # Ray sort-shuffle millions of distinct STRING keys (measured
        # 8+ min at 6M lines); per-bucket pandas hash-groupby on the
        # real string keeps exactness with 64 numeric groups instead
        h = pd.util.hash_array(out["line"].to_numpy(object))
        out["_b"] = (h % np.uint64(buckets)).astype("int64")
        return out

    freq = (ds.map_batches(count_partials, batch_format="pandas")
            .groupby("_b").map_groups(
                lambda g: g.groupby("line", sort=False, as_index=False)
                ["n"].sum(),
                batch_format="pandas"))
    # tiny by nature (≤ corpus_lines / max_freq); materialized so the
    # count + collect below don't re-run the counting shuffle
    hot_ds = freq.map_batches(
        lambda df: df[df["n"] > max_freq][["line"]],
        batch_format="pandas").materialize()
    n_hot = hot_ds.count()

    if n_hot <= broadcast_limit and not force_join:
        hot_ref = ray.put(frozenset(hot_ds.to_pandas()["line"]))

        def strip(df: pd.DataFrame, _ref=hot_ref) -> pd.DataFrame:
            hot = ray.get(_ref)
            s = df[col].astype(str).str.split("\n")
            n = s.str.len().to_numpy()
            ex = pd.DataFrame({id_col: df[id_col].to_numpy().repeat(n),
                               "line": np.concatenate(s.to_numpy())})
            keep = ~ex["line"].isin(hot).to_numpy()
            kept = (ex[keep].groupby(id_col, sort=False)["line"]
                    .agg(["\n".join, "size"])
                    .rename(columns={"join": "clean_text",
                                     "size": "n_kept"}).reset_index())
            tot = pd.DataFrame({id_col: df[id_col].to_numpy(),
                                "n_lines": n.astype("int64")})
            out = tot.merge(kept, on=id_col, how="inner")
            out["n_removed"] = (out["n_lines"]
                                - out["n_kept"].astype("int64"))
            return out[[id_col, "clean_text", "n_lines", "n_removed"]]

        return ds.map_batches(strip, batch_format="pandas").sort(id_col)

    # membership-join path: exploded (doc, line_no, line, n_lines) rows
    # anti-join the frequent siphashes, then one doc-bucket shuffle
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].astype(str).str.split("\n")
        n = s.str.len().to_numpy()
        total = int(n.sum())
        starts = np.repeat(np.cumsum(n) - n, n)
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy().repeat(n),
            "line_no": (np.arange(total) - starts).astype("int64"),
            "line": np.concatenate(s.to_numpy()),
            "n_lines": n.astype("int64").repeat(n)})
        out["h"] = pd.util.hash_array(out["line"].to_numpy(object))
        return out

    hot_ids = hot_ds.map_batches(
        lambda df: pd.DataFrame(
            {"h": pd.util.hash_array(df["line"].to_numpy(object))}),
        batch_format="pandas")
    kept = membership_join(
        ds.map_batches(explode, batch_format="pandas"), hot_ids,
        id_col="h", ids_col="h", keep=False, buckets=buckets)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        with np.errstate(over="ignore"):
            h = ids.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
        df = df.copy()
        df["_b"] = (h % np.uint64(buckets)).astype("int64")
        return df

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "line_no"], kind="mergesort")
        agg = (g.groupby(id_col, sort=False)
               .agg(clean_text=("line", "\n".join),
                    n_lines=("n_lines", "first"),
                    n_kept=("line", "size")).reset_index())
        agg["n_removed"] = agg["n_lines"] - agg["n_kept"].astype("int64")
        return agg[[id_col, "clean_text", "n_lines", "n_removed"]]

    return (kept.map_batches(add_b, batch_format="pandas")
            .groupby("_b").map_groups(
                lambda g: reassemble(g.drop(columns=["_b"])),
                batch_format="pandas")
            .sort(id_col))


def remove_duplicate_spans(docs_ds, n: int = 8, buckets: int = 64,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           broadcast_limit: int = 20_000_000,
                           force_join: bool = False):
    """Cross-document duplicate-SPAN removal — the acting counterpart
    of ``duplicate_ngram_coverage``'s diagnostic (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    ExactSubstr-style at word-n-gram granularity): a token is removed
    when it is covered by any word n-gram that also occurs in another
    document, UNLESS this document is the n-gram's keeper (the minimum
    doc_id containing it) — so exactly one copy of every duplicated
    span survives corpus-wide, deterministically.

    Shape at 100 TB (the coverage operator's contract, plus one
    reassembly): the keyer emits slim (hash:u64, doc_id, pos) rows —
    text never enters the first shuffle.  Bucketing by n-gram hash
    co-locates all occurrences, so keeper election (`min doc_id` per
    hash) and drop emission are bucket-local: a row drops iff its
    doc_id differs from the hash's min — which already implies ≥2
    distinct docs.  The drop set is duplication-bounded (one row per
    duplicated position, NOT per position), so below
    ``broadcast_limit`` rows it is broadcast once (``ray.put`` of two
    sorted int64 arrays) and the strip is a SHUFFLE-FREE map — text
    never moves (the ``corpus_line_dedup`` recipe).  Above the limit,
    drop positions meet the documents in ONE doc-hash bucketed union
    shuffle (the asof-join recipe).  Both paths share the same
    difference-array-cumsum strip kernel and emit identical results
    (path-parity test).  Same 2⁻⁶⁴ rolling-hash collision caveat as
    ``duplicate_ngrams`` (the oracle compares n-gram STRINGS).

    Note (ADVICE r4): unlike most lazy query surfaces this function
    EXECUTES the drop-set derivation at call time (materialize +
    count to pick the path; a driver ``to_pandas`` of the drop rows on
    the broadcast path) and returns a Dataset only for the strip
    stage; ``broadcast_limit`` is a row-count proxy for driver memory
    (20M rows ≈ 320 MB of int64 pairs plus pandas overhead)."""
    import ray

    mix = np.uint64(0x9E3779B97F4A7C15)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        ng, od, _, pos = _flat_ngram_hashes(df, text_col, n)
        ids = df[id_col].to_numpy()
        with np.errstate(over="ignore"):
            b = ((ng * mix) % np.uint64(buckets)).astype("int64")
        return pd.DataFrame({id_col: ids[od], "h": ng, "pos": pos,
                             "_b": b})

    def bucket_drops(g: pd.DataFrame) -> pd.DataFrame:
        keeper = g.groupby("h", sort=False)[id_col].transform("min")
        d = g[g[id_col].to_numpy() != keeper.to_numpy()]
        return d[[id_col, "pos"]]

    # pinned barrier: consumed by the count probe AND the chosen strip
    # path (the containment-join lesson); rows are duplication-bounded
    drops = (docs_ds.map_batches(emit, batch_format="pandas")
             .groupby("_b").map_groups(
                 lambda g: bucket_drops(g.drop(columns=["_b"])),
                 batch_format="pandas")).materialize()

    def strip_docs(docs: pd.DataFrame, dpos: np.ndarray) -> pd.DataFrame:
        """Shared strip kernel: ``dpos`` holds the FLAT token indices
        (over this frame's concatenated tokens) where a duplicated
        n-gram interval starts; coverage of the [p, p+n) intervals is
        one difference-array cumsum."""
        toks = docs[text_col].fillna("").str.split()
        lengths = toks.str.len().fillna(0).astype("int64").to_numpy()
        total = int(lengths.sum())
        owner = np.repeat(np.arange(len(docs)), lengths)
        flat = (np.concatenate(toks.to_numpy()) if total
                else np.empty(0, dtype=object))
        diff = np.zeros(total + n + 1, dtype="int64")
        np.add.at(diff, dpos, 1)
        np.add.at(diff, dpos + n, -1)
        covered = np.cumsum(diff[:total]) > 0
        kept = ~covered
        joined = (pd.Series(flat[kept])
                  .groupby(owner[kept], sort=False).agg(" ".join)
                  if kept.any() else pd.Series([], dtype=object))
        clean = pd.Series([""] * len(docs), dtype=object)
        clean.iloc[joined.index.to_numpy()] = joined.to_numpy()
        n_removed = np.bincount(owner[covered],
                                minlength=len(docs)).astype("int64")
        return pd.DataFrame({
            id_col: docs[id_col].to_numpy(),
            "clean_text": clean.to_numpy(),
            "n_tokens": lengths,
            "n_removed": n_removed})

    def _doc_starts(docs: pd.DataFrame) -> np.ndarray:
        lens = (docs[text_col].fillna("").str.split().str.len()
                .fillna(0).astype("int64").to_numpy())
        return np.cumsum(lens) - lens

    if drops.count() <= broadcast_limit and not force_join:
        # broadcast path: two sorted int64 arrays, strip shuffle-free
        dd = drops.to_pandas()      # bounded by broadcast_limit rows
        order = np.lexsort((dd["pos"].to_numpy(),
                            dd[id_col].to_numpy()))
        ref = ray.put((dd[id_col].to_numpy()[order],
                       dd["pos"].to_numpy()[order].astype("int64")))

        def strip(docs: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            docs = docs.reset_index(drop=True)
            did, dp = ray.get(_ref)
            ids = docs[id_col].to_numpy()
            lo = np.searchsorted(did, ids, side="left")
            hi = np.searchsorted(did, ids, side="right")
            cnt = hi - lo
            rep = np.repeat(np.arange(len(docs)), cnt)
            base = np.repeat(np.cumsum(cnt) - cnt, cnt)
            take = np.repeat(lo, cnt) + (np.arange(int(cnt.sum()))
                                         - base)
            dpos = _doc_starts(docs)[rep] + dp[take]
            return strip_docs(docs, dpos)

        return docs_ds.map_batches(strip,
                                   batch_format="pandas").sort(id_col)

    # join path: drop positions meet the docs in ONE doc-hash bucketed
    # union shuffle (text moves once)
    def _doc_bucket(ids: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = pd.util.hash_array(ids) * mix
        return (h % np.uint64(buckets)).astype("int64")

    def tag_drops(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "pos": df["pos"].to_numpy().astype("int64"),
            text_col: pd.Series([None] * len(df), dtype=object)})
        out["_b2"] = _doc_bucket(out[id_col].to_numpy())
        return out

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "pos": np.full(len(df), -1, dtype="int64"),
            text_col: df[text_col].astype(object).to_numpy()})
        out["_b2"] = _doc_bucket(out[id_col].to_numpy())
        return out

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["pos"] < 0].reset_index(drop=True)
        dr = g[g["pos"] >= 0]
        row_of = pd.Series(np.arange(len(docs)),
                           index=docs[id_col].to_numpy())
        dpos = (_doc_starts(docs)[row_of[dr[id_col].to_numpy()]
                                  .to_numpy()]
                + dr["pos"].to_numpy()) if len(dr) else \
            np.empty(0, dtype="int64")
        return strip_docs(docs, dpos)

    both = (drops.map_batches(tag_drops, batch_format="pandas")
            .union(docs_ds.map_batches(tag_docs, batch_format="pandas")))
    return (both.groupby("_b2").map_groups(
        lambda g: reassemble(g.drop(columns=["_b2"])),
        batch_format="pandas").sort(id_col))
