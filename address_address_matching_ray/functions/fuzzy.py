"""Fuzzy string-similarity kernels (rapidfuzz-compatible, from scratch).

The reference scores candidate pairs with ``rapidfuzz.fuzz`` ratios
(``optimized.py:617-684``).  rapidfuzz is not available here, so this
module re-implements the exact metrics from their public definitions:

- ``ratio``            = normalized Indel similarity
                         ``100 * 2*LCS(a,b) / (len(a)+len(b))``
- ``token_sort_ratio`` = ``ratio`` on whitespace-split, sorted, re-joined
- ``partial_ratio``    = best ``ratio`` of the shorter string against
                         rapidfuzz's window set — leading prefixes,
                         every full-length window, trailing suffixes,
                         with the edge-char gate (the published
                         short-needle algorithm; closes the round-3
                         "few points on rare inputs" delta that
                         full-window-only search had)

Scalar functions are the spec (simple DP).  ``batch_ratio`` is the
hot-path engine: a bit-parallel LCS (Allison–Dix/Hyyrö recurrence)
vectorized across an entire batch of pairs with numpy uint64 — one
64-bit machine word per pair, ~L vector ops per batch instead of a
Python DP per pair.  Pairs whose shorter string exceeds 64 chars fall
back to per-pair Python big-int bit-parallelism.

Also provides ``jaro_winkler`` and token-``jaccard`` for the tier
ladder (north-star tiers 1-2).
"""

from __future__ import annotations

import numpy as np

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Popcount of a uint64 array via a byte lookup table (numpy<2)."""
    return _POPCNT8[v.view(np.uint8).reshape(v.shape + (8,))].sum(axis=-1).astype(np.int64)


# ──────────────────────────────────────────────────────────────
# Scalar spec
# ──────────────────────────────────────────────────────────────

def lcs_len(a: str, b: str) -> int:
    """Longest-common-subsequence length, plain DP (spec / fallback)."""
    if not a or not b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    # bit-parallel over b with a Python big int (arbitrary length)
    pm: dict[str, int] = {}
    for j, ch in enumerate(b):
        pm[ch] = pm.get(ch, 0) | (1 << j)
    width = (1 << len(b)) - 1
    v = width
    for ch in a:
        u = v & pm.get(ch, 0)
        v = ((v + u) | (v - u)) & width
    return len(b) - bin(v).count("1")


def ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.ratio``: normalized Indel similarity in [0,100]."""
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    return 200.0 * lcs_len(a, b) / (la + lb)


def token_sort_ratio(a: str, b: str) -> float:
    """``fuzz.token_sort_ratio`` — used for street fuzz (optimized.py:639)."""
    return ratio(" ".join(sorted(a.split())), " ".join(sorted(b.split())))


def _partial_windows(s: str, l: str):
    """rapidfuzz's ``_partial_ratio_short_needle`` window enumeration
    (public pure-python fallback, rapidfuzz/fuzz_py.py): leading
    prefixes ``l[:i]``, every full-length window, trailing suffixes
    ``l[i:]`` — each gated by its edge character appearing in the
    needle (dropping a non-matching edge char can only raise the
    normalized score, and that shorter window is enumerated too)."""
    m, n = len(s), len(l)
    cs = set(s)
    for i in range(1, m):
        if l[i - 1] in cs:
            yield l[:i]
    for i in range(n - m + 1):
        if l[i + m - 1] in cs:
            yield l[i:i + m]
    for i in range(n - m + 1, n):
        if l[i] in cs:
            yield l[i:]


def partial_ratio(a: str, b: str) -> float:
    """``fuzz.partial_ratio`` — used for city (optimized.py:676).
    Block-anchored search matching rapidfuzz's published algorithm
    (prefix + full + suffix windows with the edge-char gate), not just
    full-length sliding windows: e.g. ``("ab", "ba") → 66.67`` (best
    alignment is ``"b"``), where a full-window-only search says 50."""
    if not a and not b:
        return 100.0
    if not a or not b:
        return 0.0
    s, l = (a, b) if len(a) <= len(b) else (b, a)
    # exact-containment fast path (rapidfuzz does the same): a verbatim
    # occurrence of the needle IS a full window with ratio 100, so the
    # answer is already known — equal/contained pairs dominate real
    # blocked candidate batches
    if s in l:
        return 100.0
    best = 0.0
    for w in _partial_windows(s, l):
        r = ratio(s, w)
        if r > best:
            best = r
            if best == 100.0:
                break
    return best


def jaccard(a_tokens, b_tokens) -> float:
    """Token-set Jaccard similarity in [0,100] (tier-2 kernel)."""
    sa, sb = set(a_tokens), set(b_tokens)
    if not sa and not sb:
        return 100.0
    inter = len(sa & sb)
    return 100.0 * inter / (len(sa) + len(sb) - inter)


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler similarity in [0,100] (public textbook definition)."""
    if a == b:
        return 100.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i, ch in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ch:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / la + matches / lb + (matches - t) / matches) / 3
    prefix = 0
    for i in range(min(4, la, lb)):
        if a[i] == b[i]:
            prefix += 1
        else:
            break
    return 100.0 * (jaro + prefix * prefix_weight * (1 - jaro))


# ──────────────────────────────────────────────────────────────
# Batched engine
# ──────────────────────────────────────────────────────────────

def _encode(strings, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """→ (codes (N,max_len) int64 padded with -1, lengths (N,)).

    UTF-32 code points in int64: an earlier int16/utf-16 encoding made
    any code point ≥ U+8000 (Hangul, most CJK, surrogate halves of
    emoji) negative, which bypassed the wide-char fallback and crashed
    the scorer task on the first non-Latin row; utf-32 also keeps
    astral-plane chars one unit, matching the scalar spec's Python
    semantics exactly."""
    n = len(strings)
    codes = np.full((n, max_len), -1, dtype=np.int64)
    lens = np.empty(n, dtype=np.int64)
    for i, s in enumerate(strings):
        ls = len(s)
        lens[i] = ls
        if ls:
            codes[i, :ls] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32)[:max_len].astype(np.int64)
    return codes, lens


def batch_lcs_len(a_strs, b_strs) -> np.ndarray:
    """LCS length for N pairs at once.

    Mask side = the shorter string of each pair; pairs whose shorter
    side fits 64 chars run fully vectorized (one uint64 word per pair,
    Allison–Dix recurrence ``U = V & PM; V = (V+U) | (V-U)``), the rest
    drop to the scalar big-int path.
    """
    n = len(a_strs)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    # orient: b = mask side = shorter
    a_or, b_or = [], []
    for a, b in zip(a_strs, b_strs):
        if len(b) <= len(a):
            a_or.append(a); b_or.append(b)
        else:
            a_or.append(b); b_or.append(a)
    fast = np.fromiter((len(b) <= 64 for b in b_or), dtype=bool, count=n)
    slow_idx = np.nonzero(~fast)[0]
    for i in slow_idx:
        out[i] = lcs_len(a_or[i], b_or[i])
    fast_idx = np.nonzero(fast)[0]
    if len(fast_idx) == 0:
        return out
    fa = [a_or[i] for i in fast_idx]
    fb = [b_or[i] for i in fast_idx]
    m = len(fa)
    la_max = max((len(s) for s in fa), default=0)
    a_codes, a_lens = _encode(fa, max(la_max, 1))
    b_codes, b_lens = _encode(fb, 64)

    # per-pair pattern masks, indexed by char code.  ASCII-dominant text
    # (everything downstream of normalize()) uses the direct table; rare
    # wide chars trigger a compacted-alphabet fallback.
    max_code = int(max(a_codes.max(initial=0), b_codes.max(initial=0)))
    if max_code < 512:
        k = max_code + 2
        a_idx = (a_codes + 1).astype(np.int64)   # shift so pad(-1) → 0
        b_idx = (b_codes + 1).astype(np.int64)
        pad_code = 0
    else:
        alphabet, inv = np.unique(
            np.concatenate([a_codes.ravel(), b_codes.ravel()]), return_inverse=True)
        k = len(alphabet)
        a_idx = inv[: a_codes.size].reshape(a_codes.shape)
        b_idx = inv[a_codes.size:].reshape(b_codes.shape)
        pad_code = int(np.searchsorted(alphabet, -1))

    bit = (np.uint64(1) << np.arange(64, dtype=np.uint64))  # (64,)
    pm = np.zeros((m, k), dtype=np.uint64)
    rows_all = np.arange(m)
    for j in range(64):  # row indices unique per column → plain fancy |=
        pm[rows_all, b_idx[:, j]] |= bit[j]
    pm[:, pad_code] = 0  # padding char never matches

    width = np.where(b_lens >= 64, np.uint64(0xFFFFFFFFFFFFFFFF),
                     (np.uint64(1) << b_lens.astype(np.uint64)) - np.uint64(1))
    v = width.copy()
    with np.errstate(over="ignore"):
        for i in range(la_max):
            col = a_idx[:, i]
            active = a_codes[:, i] >= 0
            u = v & pm[rows_all, col]
            nv = ((v + u) | (v - u)) & width
            v = np.where(active, nv, v)
    out[fast_idx] = b_lens - _popcount64(v)
    return out


def batch_ratio(a_strs, b_strs) -> np.ndarray:
    """``fuzz.ratio`` for N pairs → float64 array in [0,100]."""
    a_lens = np.fromiter((len(s) for s in a_strs), dtype=np.int64, count=len(a_strs))
    b_lens = np.fromiter((len(s) for s in b_strs), dtype=np.int64, count=len(b_strs))
    tot = a_lens + b_lens
    lcs = batch_lcs_len(a_strs, b_strs)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.where(tot > 0, 200.0 * lcs / np.maximum(tot, 1), 100.0)
    return r


def _sort_tokens(s: str) -> str:
    return " ".join(sorted(s.split()))


def batch_token_sort_ratio(a_strs, b_strs) -> np.ndarray:
    return batch_ratio([_sort_tokens(s) for s in a_strs], [_sort_tokens(s) for s in b_strs])


def batch_partial_ratio(a_strs, b_strs) -> np.ndarray:
    """Vectorized ``partial_ratio``: expands each pair into its sliding
    windows, scores all windows in ONE ``batch_ratio`` call, then takes
    the per-pair max.  Window counts are capped by the length gap, which
    is small for the city/name fields this is used on."""
    shorts, longs = [], []
    for a, b in zip(a_strs, b_strs):
        s, l = (a, b) if len(a) <= len(b) else (b, a)
        shorts.append(s); longs.append(l)
    n = len(a_strs)
    out = np.zeros(n, dtype=np.float64)
    win_a, win_b, owner = [], [], []
    for i, (s, l) in enumerate(zip(shorts, longs)):
        if not s or not l:
            continue
        if s in l:            # verbatim occurrence → a full window
            out[i] = 100.0    # with ratio 100 exists (scalar parity)
            continue
        for w in _partial_windows(s, l):
            win_a.append(s); win_b.append(w); owner.append(i)
    both_empty = [not a and not b for a, b in zip(a_strs, b_strs)]
    out[np.array(both_empty, dtype=bool)] = 100.0 if any(both_empty) else 0.0
    if win_a:
        scores = batch_ratio(win_a, win_b)
        np.maximum.at(out, np.array(owner, dtype=np.int64), scores)
    return out


def apply_unique_pairs(fn, a_strs, b_strs) -> np.ndarray:
    """Run a batched pair-metric only on the DISTINCT (a, b) string
    pairs of a batch and scatter the results back.  Candidate batches
    repeat the same component strings heavily (each doc appears in many
    pairs; streets/cities repeat across docs), so this typically cuts
    the DP work several-fold."""
    import pandas as pd

    A = np.asarray(a_strs, dtype=object)
    B = np.asarray(b_strs, dtype=object)
    ca, _ = pd.factorize(A)
    cb, ub = pd.factorize(B)
    codes = ca.astype(np.int64) * (len(ub) + 1) + cb
    order = np.argsort(codes, kind="stable")
    sorted_codes = codes[order]
    uniq_mask = np.concatenate([[True], sorted_codes[1:] != sorted_codes[:-1]])
    first = order[uniq_mask]                      # representative row per pair
    inv = np.empty(len(codes), dtype=np.int64)
    inv[order] = np.cumsum(uniq_mask) - 1
    vals = np.asarray(fn([A[i] for i in first], [B[i] for i in first]))
    return vals[inv]


def batch_jaccard(a_strs, b_strs) -> np.ndarray:
    """Token-set Jaccard per pair (strings pre-normalized, ws-tokenized)."""
    return np.fromiter((jaccard(a.split(), b.split()) for a, b in zip(a_strs, b_strs)),
                       dtype=np.float64, count=len(a_strs))


def levenshtein(a: str, b: str) -> int:
    """Levenshtein edit distance (insert/delete/substitute, unit
    costs) via Myers' bit-parallel algorithm (Myers, JACM 1999) for
    patterns ≤ 64 chars, classic DP otherwise.  Integer-valued, so a
    DuckDB ``levenshtein`` oracle needs no float-parity care at all.
    Distinct from ``ratio`` (rapidfuzz indel / LCS based — no
    substitutions), which is what the reference's scorers use."""
    if len(a) > len(b):
        a, b = b, a
    la = len(a)
    if la == 0:
        return len(b)
    if la <= 64:
        peq: dict[str, int] = {}
        for i, ch in enumerate(a):
            peq[ch] = peq.get(ch, 0) | (1 << i)
        mask = (1 << la) - 1
        last = 1 << (la - 1)
        pv, mv, score = mask, 0, la
        for ch in b:
            eq = peq.get(ch, 0)
            xv = eq | mv
            xh = (((eq & pv) + pv) & mask ^ pv) | eq
            ph = mv | (~(xh | pv) & mask)
            mh = pv & xh
            if ph & last:
                score += 1
            elif mh & last:
                score -= 1
            ph = ((ph << 1) | 1) & mask
            mh = (mh << 1) & mask
            pv = mh | (~(xv | ph) & mask)
            mv = ph & xv
        return score
    # numpy DP fallback for long strings; the sequential insert
    # relaxation cur[j] = min(cur[j], cur[j-1]+1) vectorizes as a
    # running prefix-min with slope removed:
    # cur[j] = j + min_{k<=j}(cur[k] - k)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(len(b) + 1, dtype=np.int64)
    for i, ch in enumerate(a, 1):
        cur = np.empty_like(prev)
        cur[0] = i
        sub = prev[:-1] + (bb != np.uint32(ord(ch)))
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        t = cur - idx
        np.minimum.accumulate(t, out=t)
        cur = t + idx
        prev = cur
    return int(prev[-1])


def batch_levenshtein(a_strs, b_strs) -> np.ndarray:
    """Per-pair Levenshtein, factorization-friendly (route through
    ``apply_unique_pairs`` in callers — candidate batches repeat
    strings heavily)."""
    return np.fromiter((levenshtein(a, b)
                        for a, b in zip(a_strs, b_strs)),
                       dtype=np.int64, count=len(a_strs))


def damerau_levenshtein(a: str, b: str) -> int:
    """FULL (unrestricted) Damerau–Levenshtein distance — the
    Lowrance–Wagner 1975 DP with the per-character last-occurrence
    table, matching DuckDB's ``damerau_levenshtein`` (which is the
    full variant: ``('ca','abc') = 2``, where restricted OSA gives 3).
    Integer-valued spec kernel; route batches through
    ``apply_unique_pairs``."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxd = la + lb
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    da: dict[str, int] = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,          # substitute / match
                d[i + 1][j] + 1,         # insert
                d[i][j + 1] + 1,         # delete
                d[k][l] + (i - k - 1) + 1 + (j - l - 1))  # transpose
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def batch_damerau_levenshtein(a_strs, b_strs) -> np.ndarray:
    return np.fromiter((damerau_levenshtein(a, b)
                        for a, b in zip(a_strs, b_strs)),
                       dtype=np.int64, count=len(a_strs))
