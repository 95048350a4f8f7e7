"""Numpy fingerprint kernels: determinism, similarity behavior, LCS."""

import numpy as np

from courlan_spark.functions import hashing as H
from courlan_spark.operators.suffix import (
    longest_common_substring,
    winnow_fingerprints,
)


def test_shingles_deterministic_and_unique():
    a = H.shingle_hashes("hello world, this is a document")
    b = H.shingle_hashes("hello world, this is a document")
    assert (a == b).all()
    assert len(np.unique(a)) == len(a)


def test_short_text_single_shingle():
    assert H.shingle_hashes("abc").size == 1
    assert H.shingle_hashes("").size == 1


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(300)]
    base = " ".join(rng.choice(words, 200))
    tokens = base.split()
    tokens[::10] = ["XX"] * len(tokens[::10])
    variant = " ".join(tokens)
    sa, sb = H.shingle_hashes(base), H.shingle_hashes(variant)
    true_j = H.jaccard(sa, sb)
    est = float(
        (H.minhash_signature(sa) == H.minhash_signature(sb)).mean()
    )
    assert abs(true_j - est) < 0.12


def test_band_hashes_match_iff_band_equal():
    sig = H.minhash_signature(H.shingle_hashes("some document text here"))
    bands_a = H.band_hashes(sig)
    assert len(bands_a) == H.DEFAULT_BANDS
    # identical signature -> identical band keys
    assert (bands_a == H.band_hashes(sig.copy())).all()
    # band keys from different band indexes never collide
    assert len(set(bands_a.tolist())) == len(bands_a)


def test_simhash_hamming_tracks_similarity():
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("dog", "cat")
    far = "entirely different content with other words " * 5
    f_base, f_near, f_far = map(H.simhash64, (base, near, far))
    assert H.hamming64(f_base, f_near) < H.hamming64(f_base, f_far)
    assert H.hamming64(f_base, f_base) == 0


def test_simhash_blocks_pigeonhole():
    a = 0b1010_1111
    b = a ^ 0b111  # 3 bit flips -> must share >= 1 of 4 blocks
    assert set(H.simhash_blocks(a)) & set(H.simhash_blocks(b))


def test_lcs_exact():
    assert longest_common_substring("abcdef", "zabcq") == 3
    assert longest_common_substring("abc", "xyz") == 0
    assert longest_common_substring("", "abc") == 0
    shared = "S" * 80
    assert longest_common_substring("aa" + shared + "bb", "cc" + shared) == 80


def test_winnowing_guarantee():
    import numpy as np

    rng = np.random.default_rng(1)
    letters = list("abcdefghijklmnopqrstuvwxyz ")
    doc_a = "".join(rng.choice(letters, 400))
    doc_b = "".join(rng.choice(letters, 400))
    shared = "".join(rng.choice(letters, 80))  # > w + k - 1 = 63
    fa = winnow_fingerprints(doc_a + shared)
    fb = winnow_fingerprints(shared + doc_b)
    assert set(fa.tolist()) & set(fb.tolist())


def test_partition_suffix_array_pass(spark):
    from courlan_spark.operators.suffix import partition_suffix_array_pass

    shared = (
        "the quick brown fox jumps over the lazy dog while the band plays on "
        * 2
    )
    rows = [
        (1, "aaa " + shared + " bbb"),
        (2, "ccc " + shared + " ddd"),
        (3, "totally unrelated text that shares nothing with the others"),
        (4, "another lonely document with its own words and phrases"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    out = [tuple(r) for r in partition_suffix_array_pass(df, min_length=63).collect()]
    assert len(out) == 1
    doc_a, doc_b, block_len = out[0]
    assert (doc_a, doc_b) == (1, 2) and block_len >= 63
