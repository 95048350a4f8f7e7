"""Batch fingerprint kernels must be bit-for-bit equal to the per-doc
kernels they amortize.  Only the kernels where batching WINS are kept
(band folding: 4-13x — tiny fixed-size rows pay mostly numpy call
overhead per doc); batch MinHash/SimHash/winnow variants were measured
SLOWER at web-document feature counts (cache-resident per-doc kernels
beat out-of-cache concatenated intermediates) and rejected — see
PLANS.md round 3.
"""

import numpy as np
import pytest

from courlan_spark.functions import hashing



def _random_feature_lists(seed: int) -> list[np.ndarray]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(60):
        n = int(rng.integers(0, 40))
        # duplicates on purpose: equal features must collapse identically
        out.append(
            rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
            if n
            else np.empty(0, dtype=np.uint64)
        )
    out.append(np.empty(0, dtype=np.uint64))
    out.append(np.zeros(5, dtype=np.uint64))
    return out


def test_band_hashes_batch_equals_scalar():
    rng = np.random.default_rng(5)
    sigs = rng.integers(0, 1 << 60, size=(40, 128), dtype=np.int64)
    batch = hashing.band_hashes_batch(sigs, bands=32)
    for i in range(sigs.shape[0]):
        assert np.array_equal(batch[i], hashing.band_hashes(sigs[i], bands=32)), i
