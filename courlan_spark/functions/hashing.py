"""Numpy-vectorized text fingerprinting kernels + their pandas UDFs.

MinHash (128-perm, 9-char shingles), SimHash (64-bit) and band
hashing for LSH, per the north rule (/root/repo/BASELINE.json:6,14).
The kernels are pure numpy over Arrow batches — no per-row Python in
the hashing hot path beyond the unavoidable string -> codepoint
decode, which is a single vectorized ``frombuffer`` per document.

Design notes for 100 TB scale:
* shingle hashes are 32-bit values produced by a vectorized rolling
  polynomial over UTF-32 codepoints (sliding_window_view @ powers);
* MinHash uses the classic (a*x + b) mod p family with p = 2^61-1;
  products stay < 2^63 because a,b < 2^31 and x < 2^32 — no overflow
  in uint64 arithmetic, no Python bigints;
* signatures are deduplicated-shingle based and chunked so memory per
  document stays bounded regardless of document length;
* band hashes fold (band_id, r signature values) into one 61-bit key
  so the LSH candidate join is a single equi-join on (band_hash).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from numpy.lib.stride_tricks import sliding_window_view

MERSENNE61 = (1 << 61) - 1
_SHINGLE_BASE = np.uint64(1000003)
_CHUNK = 16384

DEFAULT_NUM_PERM = 128
DEFAULT_SHINGLE_K = 9
DEFAULT_BANDS = 32
DEFAULT_SEED = 42


def _permutation_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_powers(k: int) -> np.ndarray:
    powers = np.empty(k, dtype=np.uint64)
    acc = np.uint64(1)
    mask = np.uint64(0xFFFFFFFF)
    for i in range(k - 1, -1, -1):
        powers[i] = acc
        acc = (acc * _SHINGLE_BASE) & mask
    return powers


_POWERS_CACHE: dict[int, np.ndarray] = {}
_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def shingle_hashes(text: str, k: int = DEFAULT_SHINGLE_K) -> np.ndarray:
    """Unique 32-bit rolling hashes of all k-character shingles.
    Shorter-than-k texts hash as a single whole-text shingle."""
    if k not in _POWERS_CACHE:
        _POWERS_CACHE[k] = _shingle_powers(k)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if codes.size == 0:
        codes = np.zeros(1, dtype=np.uint64)
    if codes.size < k:
        powers = _POWERS_CACHE[k][-codes.size :]
        value = (codes * powers).sum() & np.uint64(0xFFFFFFFF)
        return np.array([value], dtype=np.uint64)
    windows = sliding_window_view(codes, k)
    hashes = (windows @ _POWERS_CACHE[k]) & np.uint64(0xFFFFFFFF)
    return np.unique(hashes)


def minhash_signature(
    shingles: np.ndarray,
    num_perm: int = DEFAULT_NUM_PERM,
    seed: int = DEFAULT_SEED,
) -> np.ndarray:
    "128-perm MinHash signature (int64) over a unique-shingle array."
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _permutation_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    prime = np.uint64(MERSENNE61)
    sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    for start in range(0, shingles.size, _CHUNK):
        block = shingles[start : start + _CHUNK]
        values = (a[:, None] * block[None, :] + b[:, None]) % prime
        np.minimum(sig, values.min(axis=1), out=sig)
    return sig.astype(np.int64)


def band_hashes(signature: np.ndarray, bands: int = DEFAULT_BANDS) -> np.ndarray:
    """Fold a signature into `bands` 61-bit LSH bucket keys; the band
    index is mixed in so buckets from different bands never collide."""
    sig = signature.astype(np.uint64)
    rows = sig.size // bands
    grouped = sig[: rows * bands].reshape(bands, rows)
    mixer = np.uint64(0x9E3779B97F4A7C15)
    acc = np.zeros(bands, dtype=np.uint64)
    for i in range(rows):
        acc = ((acc ^ grouped[:, i]) * mixer) % np.uint64(MERSENNE61)
    acc = (acc + np.arange(bands, dtype=np.uint64) * mixer) % np.uint64(MERSENNE61)
    return acc.astype(np.int64)


def jaccard(shingles_a: np.ndarray, shingles_b: np.ndarray) -> float:
    "Exact Jaccard over two unique-shingle arrays."
    inter = np.intersect1d(shingles_a, shingles_b, assume_unique=True).size
    union = shingles_a.size + shingles_b.size - inter
    return inter / union if union else 1.0


_TOKEN_HASH_CACHE: dict[str, int] = {}
_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def _token_hash(token: str) -> int:
    cached = _TOKEN_HASH_CACHE.get(token)
    if cached is None:
        cached = int.from_bytes(
            hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big"
        )
        if len(_TOKEN_HASH_CACHE) < 2_000_000:
            _TOKEN_HASH_CACHE[token] = cached
        return cached
    return cached


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (token weight = count).
    Returned as a signed int64 for Spark LongType columns."""
    tokens = text.split()
    if not tokens:
        return 0
    uniq, counts = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
    hashes = np.fromiter(
        (_token_hash(t) for t in uniq), dtype=np.uint64, count=uniq.size
    )
    bits = ((hashes[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
    weights = counts.astype(np.int64)[:, None]
    acc = ((2 * bits - 1) * weights).sum(axis=0)
    fingerprint = np.uint64(0)
    for i in range(64):
        if acc[i] >= 0:
            fingerprint |= np.uint64(1) << np.uint64(i)
    return int(fingerprint.astype(np.int64))


def hamming64(x: int, y: int) -> int:
    "Hamming distance between two 64-bit fingerprints."
    return int(bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1"))


def simhash_blocks(fingerprint: int, blocks: int = 4) -> list[int]:
    """Split a 64-bit fingerprint into `blocks` equal bit-blocks; by
    pigeonhole, two fingerprints within hamming distance blocks-1
    share at least one block value — the SimHash LSH bucketing key."""
    width = 64 // blocks
    mask = (1 << width) - 1
    unsigned = fingerprint & 0xFFFFFFFFFFFFFFFF
    return [
        ((unsigned >> (i * width)) & mask) | (i << (width + 1))
        for i in range(blocks)
    ]


# --- pandas UDF factories (imported lazily by the operators layer) ------


def make_minhash_udf(
    num_perm: int = DEFAULT_NUM_PERM,
    shingle_k: int = DEFAULT_SHINGLE_K,
    seed: int = DEFAULT_SEED,
):
    "text -> array<long> MinHash signature UDF."
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def minhash_udf(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            if not isinstance(text, str):
                text = ""
            sig = minhash_signature(
                shingle_hashes(text, shingle_k), num_perm=num_perm, seed=seed
            )
            out.append(sig.tolist())
        return pd.Series(out)

    return minhash_udf


def make_band_hash_udf(bands: int = DEFAULT_BANDS):
    "signature array<long> -> array<long> of LSH band bucket keys."
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def bands_udf(signatures: pd.Series) -> pd.Series:
        return pd.Series(
            [
                band_hashes(np.asarray(sig, dtype=np.int64), bands=bands).tolist()
                for sig in signatures
            ]
        )

    return bands_udf


def make_simhash_udf():
    "text -> long 64-bit SimHash fingerprint UDF."
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [simhash64(t) if isinstance(t, str) else 0 for t in texts],
            dtype="int64",
        )

    return simhash_udf


def make_jaccard_udf(shingle_k: int = DEFAULT_SHINGLE_K):
    "(text_a, text_b) -> double exact Jaccard on k-char shingles."
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for text_a, text_b in zip(a, b):
            sa = shingle_hashes(text_a if isinstance(text_a, str) else "", shingle_k)
            sb = shingle_hashes(text_b if isinstance(text_b, str) else "", shingle_k)
            out.append(jaccard(sa, sb))
        return pd.Series(out, dtype="float64")

    return jaccard_udf
