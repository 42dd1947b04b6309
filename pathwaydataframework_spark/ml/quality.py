"""Trainable document-quality classifier: full-batch logistic regression
over hashed bag-of-words features, the fastText-style linear classifier
(Joulin et al. 2016, arXiv:1607.01759) that CCNet/GPT-3-era pipelines use
to score "does this page look like the high-quality corpus".

The reference engine has no trainable classifier; this is north-star
addendum surface.  Design follows the k-means playbook
(operators/clustering.py): a fixed number of deterministic full-batch
gradient-descent iterations expressed as DataFrame ops, every
cross-engine-fragile quantity rounded to 6 decimals, every sum an exact
decimal fold — so an external SQL oracle replays the whole training
trajectory bit-for-bit.

Features are tf-normalized (fastText's averaged input), so margins are
O(max|w|) regardless of document length.

Dataflow per iteration (the inherent full-batch GD shape):
- margins: features ⋈ broadcast(weights) → per-doc decimal sum (one
  doc-keyed exchange; map-side partials collapse each partition first)
- residuals: sigmoid(margin) rounded to 6dp, minus the integer label
- gradient: features ⋈ residuals → per-bucket decimal sum / N (one
  bucket-keyed exchange), then ``w ← round(w − lr·grad, 6)``
The weight table (≤ buckets+1 rows) is checkpointed per round — tiny.
Features are checkpointed once; at 100 TB swap the localCheckpoint for a
persisted parquet artifact, the plan is otherwise unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_ROUND = 6


def hashed_bow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int,
    seed: int = 0,
) -> DataFrame:
    """(id, bucket, x) tf-normalized hashed bag-of-words — fastText's
    mean-of-word-vectors input: x = round(cnt / doc_len, 6), so per-doc
    features sum to 1 regardless of length and gradient descent is not
    hostage to document size.  One intercept pseudo-feature
    (bucket = ``buckets``, x = 1) per token-bearing doc.  Token-less docs
    have no features and are excluded from training and prediction
    (nothing to score).  The 6dp rounding keeps x an exact decimal, so
    every downstream product/sum is order-independent."""
    from pathwaydataframework_spark.operators.sampling import hash_bucket
    from pathwaydataframework_spark.operators.text import tokens

    toks = F.filter(
        tokens(F.lower(F.trim(F.col(text_col)))), lambda t: F.length(t) > 0
    )
    words = df.select(F.col(id_col).alias("_id"), F.explode(toks).alias("_term"))
    lens = words.groupBy("_id").agg(F.count(F.lit(1)).alias("_len"))
    counts = (
        words.withColumn("_b", hash_bucket(F.col("_term"), seed) % F.lit(buckets))
        .groupBy("_id", "_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .join(lens, on="_id")
        .select(
            "_id",
            "_b",
            F.round(F.col("_cnt") / F.col("_len").cast("double"), _ROUND)
            .cast("decimal(18,6)")
            .alias("_x"),
        )
    )
    intercept = lens.select(
        "_id",
        F.lit(buckets).cast("long").alias("_b"),
        F.lit(1.0).cast("decimal(18,6)").alias("_x"),
    )
    return counts.unionByName(intercept)


def train_logreg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    *,
    buckets: int = 1024,
    iterations: int = 3,
    lr: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Train the classifier; returns the (bucket, w) weight table (the
    intercept lives at bucket = ``buckets``).  ``label_col`` must be
    0/1-valued.  Deterministic: zero init, fixed iteration count,
    6dp-rounded sigmoids and weights, exact decimal gradient sums."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    feats = hashed_bow(df, id_col, text_col, buckets=buckets, seed=seed).localCheckpoint(
        eager=True
    )
    labels = df.select(
        F.col(id_col).alias("_id"), F.col(label_col).cast("int").alias("_y")
    )
    n_docs = feats.select("_id").distinct().count() or 1
    weights = (
        feats.select("_b")
        .distinct()
        .withColumn("w", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        resid = (
            _margins(feats, weights)
            .join(labels, on="_id")
            .select(
                "_id",
                (
                    _sigmoid6(F.col("_m")).cast("decimal(18,6)") - F.col("_y")
                ).alias("_r"),
            )
        )
        grad = (
            feats.join(resid, on="_id")
            .groupBy("_b")
            .agg(
                (
                    F.sum(F.col("_x") * F.col("_r")).cast("double")
                    / F.lit(float(n_docs))
                ).alias("_g")
            )
        )
        weights = (
            weights.join(grad, on="_b", how="left")
            .select(
                "_b",
                F.round(
                    F.col("w") - F.lit(float(lr)) * F.coalesce(F.col("_g"), F.lit(0.0)),
                    _ROUND,
                ).alias("w"),
            )
            .localCheckpoint(eager=True)  # <= buckets+1 rows; flattens lineage
        )
    return weights.select(F.col("_b").alias("bucket"), "w")


def predict_logreg(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int,
    seed: int = 0,
) -> DataFrame:
    """Score documents with a trained weight table: (id, p, pred) where
    p = round(sigmoid(margin), 6) and pred = p >= 0.5."""
    feats = hashed_bow(df, id_col, text_col, buckets=buckets, seed=seed)
    w = weights.select(F.col("bucket").alias("_b"), "w")
    p = _sigmoid6(F.col("_m"))
    return _margins(feats, w).select(
        F.col("_id").alias(id_col),
        p.alias("p"),
        (p >= F.lit(0.5)).alias("pred"),
    )


def _margins(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """Per-doc margin Σ cnt·w as an exact decimal fold (6dp weights make
    the products and sums exact, so partial-agg order can't flip bits)."""
    return (
        feats.join(F.broadcast(weights), on="_b")
        .groupBy("_id")
        .agg(
            F.sum(F.col("_x") * F.col("w").cast("decimal(18,6)"))
            .cast("double")
            .alias("_m")
        )
    )


def _sigmoid6(m):
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), _ROUND)
