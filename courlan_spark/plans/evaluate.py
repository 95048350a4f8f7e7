"""Recall evaluation against planted duplicate truth.

Dup-pair recall (north rule, /root/repo/BASELINE.json:14): over all
unordered truth pairs {a, b} planted in the same cluster, the
fraction the pipeline assigns to one predicted cluster.

URLs that check_url rejects receive no cluster in the reference
semantics either (rejected rows produce no output row), so pairs
involving them are excluded from the denominator — both engines
agree those documents never enter the dedup corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.url_udfs import make_check_url_udf


def dup_pair_recall(
    truth_pages: DataFrame,
    assignments: DataFrame,
    strict: bool = False,
    language: str | None = None,
) -> dict:
    """truth_pages: (doc_id, url, cluster_id, dup_kind); assignments:
    (norm_url, cluster_id) predicted.  Returns overall and per-kind
    recall."""
    check_udf = make_check_url_udf(strict=strict, language=language)
    mapped = (
        truth_pages.withColumn("_c", check_udf("url"))
        .where(F.col("_c.norm_url").isNotNull())
        .select(
            "doc_id",
            F.col("cluster_id").alias("true_cluster"),
            "dup_kind",
            F.col("_c.norm_url").alias("norm_url"),
        )
        .join(
            assignments.select(
                "norm_url", F.col("cluster_id").alias("pred_cluster")
            ),
            "norm_url",
            "inner",
        )
    )
    dups = mapped.where(F.col("dup_kind") != "none").select(
        "doc_id", "true_cluster", "pred_cluster", "dup_kind"
    )
    pairs = dups.alias("a").join(
        dups.alias("b"),
        (F.col("a.true_cluster") == F.col("b.true_cluster"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    stats = pairs.groupBy(F.col("a.dup_kind").alias("dup_kind")).agg(
        F.count("*").alias("n_pairs"),
        F.sum(
            (F.col("a.pred_cluster") == F.col("b.pred_cluster")).cast("long")
        ).alias("n_hit"),
    )
    rows = stats.collect()
    total = sum(r["n_pairs"] for r in rows)
    hits = sum(r["n_hit"] for r in rows)

    # precision over predicted co-clustered pairs among truth-covered
    # docs: a predicted pair is correct iff the truth also co-clusters
    # it (truth includes singleton clusters, so false merges count)
    scored = mapped.select("doc_id", "true_cluster", "pred_cluster")
    pred_pairs = scored.alias("a").join(
        scored.alias("b"),
        (F.col("a.pred_cluster") == F.col("b.pred_cluster"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    prec_row = pred_pairs.agg(
        F.count("*").alias("n_pred"),
        F.sum(
            (F.col("a.true_cluster") == F.col("b.true_cluster")).cast("long")
        ).alias("n_correct"),
    ).first()
    n_pred = prec_row["n_pred"] or 0
    n_correct = prec_row["n_correct"] or 0

    return {
        "recall": (hits / total) if total else 1.0,
        "precision": (n_correct / n_pred) if n_pred else 1.0,
        "n_pairs": total,
        "n_hit": hits,
        "n_predicted_pairs": n_pred,
        "per_kind": {
            r["dup_kind"]: {"n_pairs": r["n_pairs"], "n_hit": r["n_hit"]} for r in rows
        },
    }
