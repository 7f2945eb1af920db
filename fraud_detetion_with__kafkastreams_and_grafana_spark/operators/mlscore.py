"""MLlib fraud scoring: the north-star's "Structured Streaming + MLlib"
inference path (BASELINE.json). The reference detects fraud with a fixed
threshold rule (TransactionProcessor.java:15,39); this operator learns a
probabilistic scorer from the same signal and applies it identically to
batch DataFrames and Structured Streaming micro-batches.

Streaming-safe by design: features are per-row expressions plus a
stream-static broadcast join against batch-computed per-user statistics
(window functions are NOT allowed on streams; a static stats dim is the
production pattern anyway — recompute it on a cadence, broadcast to the
stream). `PipelineModel.transform` is a stateless column mapping, so
batch-stream score parity holds by construction (pinned in tests).

Scale: training is one MLlib LBFGS job (treeAggregate — partial gradients
combine map-side); scoring is a narrow projection, no shuffle. Model and
stats dim are O(n_features) / O(n_users) broadcasts.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .detect import EVENTS_FRAUD_THRESHOLD

FEATURE_COLS = ["amount", "amount_z", "hour"]


def user_stats(tx: DataFrame) -> DataFrame:
    """Per-user amount statistics (the static dim for feature generation)."""
    return tx.groupBy("userId").agg(
        F.avg("amount").alias("_mu"), F.stddev_samp("amount").alias("_sd")
    )


def fraud_features(tx: DataFrame, stats: DataFrame) -> DataFrame:
    """Feature frame: raw amount, per-user z-score (vs the static stats
    dim), hour-of-day. Broadcast join -> works on batch AND streaming
    frames (stream-static join, no state)."""
    return tx.join(F.broadcast(stats), "userId", "left").select(
        "userId",
        "event_id",
        "amount",
        F.when(F.col("_sd") > 0, (F.col("amount") - F.col("_mu")) / F.col("_sd"))
        .otherwise(F.lit(0.0))
        .alias("amount_z"),
        F.hour("event_time").cast("double").alias("hour"),
        "event_time",
    )


def train_fraud_scorer(
    features: DataFrame, threshold: float = EVENTS_FRAUD_THRESHOLD
) -> PipelineModel:
    """Train a logistic-regression scorer on the threshold rule's labels.
    Deterministic: LBFGS from a zero init on a fixed dataset."""
    labeled = features.withColumn(
        "label", (F.col("amount") > threshold).cast("double")
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="features"),
            LogisticRegression(maxIter=25, regParam=0.01, standardization=True),
        ]
    )
    model = pipe.fit(labeled)
    # Strip the training summary before the model is cached/closed over:
    # LogisticRegressionModel.trainingSummary holds a reference to the
    # TRAINING DataFrame, and a downstream plan that serializes the
    # scoring UDF closure (observed under whole-stage codegen in a
    # long-lived session) then tries to java-serialize that DataFrame and
    # fails. A save/load round-trip is the supported way to get a
    # summary-free model — it is also exactly what the production
    # model-registry pattern does (train job writes, scorers load).
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="spark_graft_lrmodel_")
    try:
        model.write().overwrite().save(d)
        model = PipelineModel.load(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return model


# Index-build/query split (same shape as operators/similarity.py's
# centroid builds): the LR fit is the expensive offline step, scoring is
# the cheap repeatable query. Cache one trained model per
# (application, dataset, threshold); a new SparkSession gets a new
# applicationId, so stale JVM-bound models are never reused.
_MODEL_CACHE: dict[tuple[str, str, float], PipelineModel] = {}


def get_or_train_fraud_scorer(
    features: DataFrame,
    cache_key: str,
    threshold: float = EVENTS_FRAUD_THRESHOLD,
) -> PipelineModel:
    """Train-once accessor: fit on first use for (app, cache_key,
    threshold), then return the cached PipelineModel. In production this
    is the model-registry read in front of a scheduled training job — the
    query path must not pay a refit per invocation."""
    from ..sessioncache import session_cached

    spark = features.sparkSession
    key = (spark.sparkContext.applicationId, cache_key, threshold)
    return session_cached(
        _MODEL_CACHE, key, lambda: train_fraud_scorer(features, threshold)
    )


def score(model: PipelineModel, features: DataFrame) -> DataFrame:
    """Apply the model; unchanged on batch and streaming frames (narrow
    ops only). Returns p(fraud) per event."""
    scored = model.transform(features)
    p1 = vector_to_array(F.col("probability"))[1]
    return scored.select(
        "userId",
        "event_id",
        "amount",
        F.round(p1, 6).alias("fraud_probability"),
        F.col("prediction").cast("long").alias("predicted_fraud"),
    )
