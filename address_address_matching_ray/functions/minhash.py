"""MinHash / LSH / SimHash sketches for blocking and near-dup detection.

The reference retrieves candidates from a search service (SURVEY §2.4
J1); at 10^12-row scale candidate generation becomes locality-sensitive
blocking keys feeding a ``groupby`` shuffle (north-star rule).  These
kernels are the standard public constructions (Broder '97 MinHash,
Indyk-Motwani LSH banding, Charikar '02 SimHash) vectorized with numpy
— one matrix op per batch, no per-row Python in the hot path.

All hashing is seeded and deterministic (stable across retries —
SURVEY §4.2 determinism requirement).
"""

from __future__ import annotations

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_HASH = np.uint64((1 << 32) - 1)


def _stable_token_hash(tokens: list[str]) -> np.ndarray:
    """Deterministic 32-bit hashes of tokens — pandas' vectorized
    siphash with its fixed default key (stable across processes, unlike
    Python's salted ``hash``)."""
    import pandas as pd
    h = pd.util.hash_array(np.asarray(tokens, dtype=object), categorize=True)
    return h & _MAX_HASH


def md5_lower64(strs: "np.ndarray | list") -> np.ndarray:
    """DuckDB ``md5_number_lower`` parity hash: little-endian uint64 of
    the LAST 8 md5 digest bytes (verified against DuckDB).  Python-rate
    by nature — used only by the ORACLE variants (``*_md5`` dedup
    surfaces); the production paths keep the vectorized siphash."""
    import hashlib

    out = np.empty(len(strs), dtype=np.uint64)
    for i, s in enumerate(strs):
        out[i] = int.from_bytes(
            hashlib.md5(str(s).encode("utf-8")).digest()[8:], "little")
    return out


def shingles(tokens: list[str], k: int = 3) -> list[str]:
    """k-token shingles; falls back to the token set when len < k."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


class MinHasher:
    """Seeded universal-hash MinHash.  Build once per actor
    (``__init__``), call per batch — the permutation matrix is the
    stateful part (SURVEY §2.3 ST3 analog)."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        # a, b < 2^31 and inputs < 2^32 keep a*x + b < 2^63: the product
        # never wraps uint64 before the Mersenne reduction, so this IS
        # the universal hash family (a*x + b) mod (2^61 - 1) it claims
        # (drawing a, b up to 2^61 made a*x wrap mod 2^64 first).
        self.a = rng.randint(1, 1 << 31, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, 1 << 31, size=num_perm, dtype=np.uint64)

    def signature(self, token_hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint32 signature of one document's token hashes."""
        if len(token_hashes) == 0:
            return np.full(self.num_perm, _MAX_HASH, dtype=np.uint64)
        # (perm, tokens): (a*x + b) mod p, truncated to 32 bits
        x = token_hashes.astype(np.uint64)[None, :]
        vals = (self.a[:, None] * x + self.b[:, None]) % np.uint64(_MERSENNE)
        return (vals & _MAX_HASH).min(axis=1)

    # tokens per doc-chunk: keeps the (num_perm, chunk) uint64
    # intermediate ≈1 MB so it lives in L2 instead of streaming a
    # (num_perm, T) matrix through DRAM — with 32 workers sharing one
    # memory bus the unchunked version was bandwidth-bound ~10× slower
    _CHUNK_TOKENS = 2048

    def batch_signatures(self, docs_tokens: list[list[str]]) -> np.ndarray:
        """(n_docs, num_perm) signatures for a batch.

        Vectorized as ONE flat hash array + ``np.minimum.reduceat`` over
        document boundaries instead of a per-doc loop; the permuted-hash
        matrix is computed per doc-aligned token chunk with in-place ops
        (identical values to the one-shot form, a fraction of the memory
        traffic)."""
        lens = np.array([len(t) for t in docs_tokens], dtype=np.int64)
        n = len(docs_tokens)
        out = np.full((n, self.num_perm), int(_MAX_HASH), dtype=np.uint64)
        flat = [tok for toks in docs_tokens for tok in toks]
        if not flat:
            return out
        hashes = _stable_token_hash(flat)  # (T,)
        bounds = np.concatenate([[0], np.cumsum(lens)])
        a_col = self.a[:, None]
        b_col = self.b[:, None]
        mers = np.uint64(_MERSENNE)
        d0 = 0
        while d0 < n:
            d1 = d0 + 1
            while d1 < n and bounds[d1 + 1] - bounds[d0] <= self._CHUNK_TOKENS:
                d1 += 1
            lo, hi = bounds[d0], bounds[d1]
            if hi > lo:
                vals = a_col * hashes[None, lo:hi]
                vals += b_col
                vals %= mers
                vals &= _MAX_HASH  # (perm, chunk)
                sub = lens[d0:d1]
                ne = sub > 0
                starts = (bounds[d0:d1] - lo)[ne]
                mins = np.minimum.reduceat(vals, starts, axis=1)
                out[d0:d1][ne] = mins.T
            d0 = d1
        return out


def lsh_band_digests(signatures: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) signatures → (n, bands) uint64 band digests
    (rows of each band xor-multiply-mixed, fully vectorized)."""
    n, num_perm = signatures.shape
    rows = num_perm // bands
    sig = signatures.reshape(n, bands, rows)
    mult = np.uint64(0x9E3779B97F4A7C15)
    digest = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            digest = (digest ^ sig[:, :, r]) * mult
    return digest


def mix_band_keys_u64(digests: np.ndarray) -> np.ndarray:
    """(n, bands) uint64 digests → (n, bands) uint64 blocking keys with
    the band index folded in (splitmix-style finalizer).  Numeric keys
    keep the blocking shuffle at 8 B/row vs ~25 B for the ``"b{j}:{hex}"``
    strings AND sort numerically in the groupby; a cross-band key
    collision (~2⁻⁶⁴) at worst adds one candidate pair that verification
    rejects."""
    bands = digests.shape[1]
    with np.errstate(over="ignore"):
        x = digests ^ (np.arange(1, bands + 1, dtype=np.uint64)
                       * np.uint64(0xBF58476D1CE4E5B9))[None, :]
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def hex16(a: np.ndarray) -> np.ndarray:
    """uint64 array → '%016x' strings WITHOUT a per-element format call:
    big-endian byte view → one hex() of the whole buffer → fixed-width
    S16 reinterpret → object array."""
    if len(a) == 0:
        return np.array([], dtype=object)
    hx = np.ascontiguousarray(a, dtype=">u8").tobytes().hex()
    return np.frombuffer(hx.encode("ascii"), dtype="S16").astype("U16").astype(object)


def band_key_strings(digest: np.ndarray) -> np.ndarray:
    """(n, bands) digests → flat (n*bands,) object array of
    ``"b{band}:{digest:016x}"`` keys (row-major), vectorized."""
    n, bands = digest.shape
    prefixes = np.array([f"b{j}:" for j in range(bands)], dtype=object)
    return np.tile(prefixes, n) + hex16(digest.ravel())


def lsh_band_keys(signatures: np.ndarray, bands: int) -> list[list[str]]:
    """Split each (num_perm,) signature into ``bands`` row-groups; each
    band hashes to a blocking key ``"b{i}:{digest}"``.  Docs sharing any
    band key become candidates (classic LSH banding)."""
    n = signatures.shape[0]
    flat = band_key_strings(lsh_band_digests(signatures, bands))
    return [list(flat[i * bands:(i + 1) * bands]) for i in range(n)]


class SimHasher:
    """64-bit SimHash over token hashes (Charikar '02)."""

    def __init__(self, bits: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.bits = bits
        # one random odd multiplier per bit-mix round
        self.mix = rng.randint(1, 1 << 62, size=2, dtype=np.uint64) | np.uint64(1)

    def _token_bits(self, token_hashes: np.ndarray) -> np.ndarray:
        """(T, bits) ±1 bit matrix from 32-bit token hashes, widened to
        64 bits with two mix rounds."""
        h = token_hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            wide = (h * self.mix[0]) ^ ((h * self.mix[1]) << np.uint64(32))
        shifts = np.arange(self.bits, dtype=np.uint64)
        return ((wide[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)

    def signature(self, token_hashes: np.ndarray) -> int:
        if len(token_hashes) == 0:
            return 0
        bits = self._token_bits(token_hashes)
        votes = (2 * bits - 1).sum(axis=0)
        return int((np.uint64(1) << np.arange(self.bits, dtype=np.uint64))[votes > 0].sum())

    # tokens per doc-chunk — same cache-blocking rationale as
    # ``MinHasher.batch_signatures``: the (chunk, bits) ±1 matrix stays
    # ~1 MB instead of streaming a (T, bits) matrix through DRAM
    _CHUNK_TOKENS = 2048

    def batch_signatures(self, docs_tokens: list[list[str]]) -> np.ndarray:
        out = np.zeros(len(docs_tokens), dtype=np.uint64)
        flat = [tok for toks in docs_tokens for tok in toks]
        if not flat:
            return out
        n = len(docs_tokens)
        lens = np.array([len(t) for t in docs_tokens], dtype=np.int64)
        hashes = _stable_token_hash(flat)
        bounds = np.concatenate([[0], np.cumsum(lens)])
        powers = (np.uint64(1) << np.arange(self.bits, dtype=np.uint64))[None, :]
        d0 = 0
        while d0 < n:
            d1 = d0 + 1
            while d1 < n and bounds[d1 + 1] - bounds[d0] <= self._CHUNK_TOKENS:
                d1 += 1
            lo, hi = bounds[d0], bounds[d1]
            if hi > lo:
                bits = self._token_bits(hashes[lo:hi])  # (chunk, bits)
                bits *= 2
                bits -= 1
                sub = lens[d0:d1]
                ne = sub > 0
                starts = (bounds[d0:d1] - lo)[ne]
                votes = np.add.reduceat(bits, starts, axis=0)
                out[d0:d1][ne] = ((votes > 0).astype(np.uint64)
                                  * powers).sum(axis=1)
            d0 = d1
        return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distance between uint64 SimHash arrays."""
    from address_address_matching_ray.functions.fuzzy import _popcount64
    return _popcount64(np.bitwise_xor(a, b))


def simhash_band_keys(sigs: np.ndarray, bands: int = 4) -> list[list[str]]:
    """Near-dup blocking for SimHash: split the 64-bit signature into
    ``bands`` bit-slices; equal slice ⇒ candidate (tolerates up to
    bands−1 differing bits by the pigeonhole principle)."""
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    out: list[list[str]] = []
    slices = [(sigs >> np.uint64(j * width)) & mask for j in range(bands)]
    for i in range(len(sigs)):
        out.append([f"s{j}:{int(slices[j][i]):x}" for j in range(bands)])
    return out


def batch_set_jaccard(l_texts, r_texts, tokenize) -> np.ndarray:
    """Token-SET Jaccard (in [0,100]) for aligned text pairs —
    the ``jaccard_verify`` ORACLE kernel (``dedup.all_pairs_jaccard``).
    Semantics are exactly the scalar ``fuzzy.jaccard(tokenize(a),
    tokenize(b))`` spec (both-empty → 100); no hashing, so no
    collision caveat.

    Shape: factorize pair sides to distinct docs, build each distinct
    doc's token set ONCE, one C-level ``set &`` per pair.  Wins only
    when sides genuinely repeat within the batch (the all-pairs oracle
    probes each doc against the whole corpus slice — heavy reuse).

    NOT used on the LSH dedup verify path, by measurement (round 4):
    pair-hash pivot buckets scatter a doc's pairs across blocks, so
    real verify blocks have ~zero repetition to factorize, and the
    thousands of LIVE sets this kernel keeps per task saturated the
    shared memory bus under 32 concurrent workers — 196 s vs 10 s for
    the transient per-pair loop on the 1M-doc ngram verify stage.
    (Also measured: pausing the cyclic GC here looked 2× in a
    small-heap microbench and lost badly in real workers — full gen-2
    collections over multi-million-object heaps per block.)"""
    import pandas as pd

    l_texts = np.asarray(l_texts, dtype=object)
    r_texts = np.asarray(r_texts, dtype=object)
    npairs = len(l_texts)
    if npairs == 0:
        return np.array([], dtype=np.float64)
    codes, uniques = pd.factorize(np.concatenate([l_texts, r_texts]))
    lcode, rcode = codes[:npairs], codes[npairs:]
    sets = [set(tokenize(t)) for t in uniques]
    inter = np.fromiter(
        (len(sets[a] & sets[b]) for a, b in zip(lcode, rcode)),
        np.int64, npairs)
    sizes = np.fromiter((len(s) for s in sets), np.int64, len(sets))
    union = sizes[lcode] + sizes[rcode] - inter
    return np.where(union > 0, 100.0 * inter / np.maximum(union, 1), 100.0)


def batch_set_containment(l_texts, r_texts, tokenize
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Token-set CONTAINMENT (in [0,100]) for aligned text pairs, both
    directions: ``(100·|A∩B|/|A|, 100·|A∩B|/|B|)`` — the asymmetric
    near-dup relation resemblance misses (a quoted paragraph inside a
    long page scores low Jaccard but 100 containment).  Empty side →
    100 (the empty set is contained in anything), matching the SQL
    CASE in the oracle.  Same factorize-once shape (and the same
    only-for-the-oracle-surface caveat) as ``batch_set_jaccard``."""
    import pandas as pd

    l_texts = np.asarray(l_texts, dtype=object)
    r_texts = np.asarray(r_texts, dtype=object)
    npairs = len(l_texts)
    if npairs == 0:
        z = np.array([], dtype=np.float64)
        return z, z
    codes, uniques = pd.factorize(np.concatenate([l_texts, r_texts]))
    lcode, rcode = codes[:npairs], codes[npairs:]
    sets = [set(tokenize(t)) for t in uniques]
    inter = np.fromiter(
        (len(sets[a] & sets[b]) for a, b in zip(lcode, rcode)),
        np.int64, npairs)
    sizes = np.fromiter((len(s) for s in sets), np.int64, len(sets))
    la, lb = sizes[lcode], sizes[rcode]
    c_lr = np.where(la > 0, 100.0 * inter / np.maximum(la, 1), 100.0)
    c_rl = np.where(lb > 0, 100.0 * inter / np.maximum(lb, 1), 100.0)
    return c_lr, c_rl
