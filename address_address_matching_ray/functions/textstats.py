"""Text-analysis kernels for the large-scale training-data operators:
language ID (n-gram heuristic), quality scoring, token counting, and
rolling-hash document fingerprinting.  All operate on whole pandas
columns (vectorized) — designed to run inside ``map_batches``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Tiny language-profile table: most-frequent function words per language.
# Public knowledge (standard stopword lists); scoring = share of tokens
# that are profile words, argmax over languages.
_LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the of and to in a is that it for on with as was at by an be this have from or".split()),
    "de": frozenset("der die und das in den von zu mit sich des auf ist im nicht ein eine als auch es an".split()),
    "fr": frozenset("le la de et les des en un une du dans est que pour qui sur pas plus par il au".split()),
    "es": frozenset("el la de que y en los del se las por un para con una su al es lo como mas".split()),
    "it": frozenset("di il la che e in un a per del con non una su le si dei al lo come".split()),
    "nl": frozenset("de het een en van in is dat op te zijn met voor niet aan er om ook als bij".split()),
}

_WORD_RE = re.compile(r"[a-zA-Z']+")
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")   # BPE-ish: words + punctuation marks
_PUNCT_RE = re.compile(r"[^\w\s]")

STOPWORDS_EN = _LANG_PROFILES["en"]


def detect_language(texts: pd.Series, min_score: float = 0.05) -> pd.Series:
    """Best-scoring language profile per document; 'und' when no
    profile reaches ``min_score`` coverage.

    Fully columnar: tokenize → explode once → one vectorized ``isin``
    per profile → per-doc ``bincount`` — no per-row × per-language
    Python loop (the previous shape was the ``ds.map`` anti-pattern)."""
    langs = list(_LANG_PROFILES)
    n_docs = len(texts)
    out = np.full(n_docs, "und", dtype=object)
    if not n_docs:
        return pd.Series(out, index=texts.index)
    toks = texts.reset_index(drop=True).fillna("").str.lower() \
                .str.findall(_WORD_RE)
    n_tok = toks.str.len().to_numpy(dtype=np.int64)
    exploded = toks.explode()
    valid = exploded.notna().to_numpy()
    doc_pos = exploded.index.to_numpy()[valid]
    words = pd.Series(exploded.to_numpy()[valid], dtype=object)
    scores = np.zeros((n_docs, len(langs)))
    denom = np.maximum(n_tok, 1)
    for j, lang in enumerate(langs):
        hit = words.isin(_LANG_PROFILES[lang]).to_numpy()
        scores[:, j] = np.bincount(doc_pos[hit], minlength=n_docs) / denom
    best = scores.argmax(axis=1)
    ok = (scores.max(axis=1) >= min_score) & (n_tok > 0)
    out[ok] = np.array(langs, dtype=object)[best[ok]]
    return pd.Series(out, index=texts.index)


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Heuristic document-quality features (length, punctuation ratio,
    stopword ratio, mean word length, digit ratio) + a [0,1] composite
    ``quality`` — the web-pipeline analog of the reference's
    quality-score idea (U:760-838), applied to raw documents."""
    t = texts.fillna("")
    n_chars = t.str.len().astype("int64")
    words = t.str.lower().str.findall(_WORD_RE)
    n_words = words.str.len().astype("int64")
    mean_word_len = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
    stop_ratio = words.map(
        lambda ws: sum(1 for w in ws if w in STOPWORDS_EN) / len(ws) if ws else 0.0)
    n_punct = t.str.count(_PUNCT_RE).astype("int64")
    punct_ratio = (n_punct / n_chars.clip(lower=1)).astype("float64")
    n_digits = t.str.count(r"\d").astype("int64")
    digit_ratio = (n_digits / n_chars.clip(lower=1)).astype("float64")

    # composite: reward normal word length + some stopwords, punish
    # punctuation/digit walls and near-empty docs
    quality = (
        np.clip(n_words / 20.0, 0, 1) * 0.3
        + np.clip(stop_ratio / 0.4, 0, 1) * 0.3
        + np.clip(1 - punct_ratio * 4, 0, 1) * 0.2
        + np.clip(1 - digit_ratio * 4, 0, 1) * 0.1
        + np.clip(1 - np.abs(mean_word_len - 5) / 5, 0, 1) * 0.1
    )
    return pd.DataFrame({
        "n_chars": n_chars, "n_words": n_words,
        "mean_word_len": mean_word_len.astype("float64"),
        "stop_ratio": stop_ratio.astype("float64"),
        "punct_ratio": punct_ratio, "digit_ratio": digit_ratio,
        "quality": quality.astype("float64"),
    })


def token_count(texts: pd.Series, mode: str = "whitespace") -> pd.Series:
    """Token counts: ``whitespace`` (SQL-oracle-friendly) or ``bpe_ish``
    (words + punctuation marks via regex)."""
    t = texts.fillna("")
    if mode == "whitespace":
        return t.str.split().str.len().fillna(0).astype("int64")
    return t.str.findall(_TOKEN_RE).str.len().fillna(0).astype("int64")


def fingerprint(texts: pd.Series, window: int = 8) -> pd.Series:
    """Winnowing-style document fingerprint: polynomial rolling hash of
    normalized tokens, window-min sampled, xor-folded to one uint64.
    Stable content signature for exact/near dedup bookkeeping."""
    import pandas as pd_

    out = np.zeros(len(texts), dtype=np.uint64)
    base = np.uint64(1099511628211)
    toks_list = texts.fillna("").str.lower().str.findall(_WORD_RE)
    for i, toks in enumerate(toks_list):
        if not toks:
            continue
        h = pd_.util.hash_array(np.asarray(toks, dtype=object), categorize=False)
        if len(h) >= window:
            # rolling combine over a token window, then min-sample
            roll = h.copy()
            with np.errstate(over="ignore"):
                for w in range(1, window):
                    roll[:-w] = roll[:-w] * base + h[w:]
                sampled = roll[: len(h) - window + 1]
                mins = sampled.min()
                out[i] = np.uint64(mins ^ (np.uint64(len(toks)) * base))
        else:
            with np.errstate(over="ignore"):
                acc = np.uint64(0)
                for v in h:
                    acc = acc * base + np.uint64(v)
                out[i] = acc
    return pd.Series(out, index=texts.index)


def char_ngrams(text: str, n: int = 5) -> list[str]:
    """Character n-grams of normalized text (n-gram Jaccard dedup)."""
    t = " ".join(text.lower().split())
    if len(t) < n:
        return [t] if t else []
    return [t[i:i + n] for i in range(len(t) - n + 1)]
