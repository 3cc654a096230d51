"""Learned quality filtering — the fastText-style classifier stage of a
web-scale pipeline (GPT-3 §2.2, CCNet, Gopher all train a linear
classifier that separates "reference-quality" text from raw crawl and
keep documents scoring above a threshold).

Spark-first: features are hashed token counts (`HashingTF` — fixed
dimensionality, no vocabulary state to ship), the model is
`pyspark.ml` LogisticRegression (JVM L-BFGS), and scoring is a single
model transform — one narrow pass over the corpus, no Python in the
loop. The trained model broadcasts implicitly with the plan; at 100 TB
only the (tiny) coefficient vector ships to executors.

Weak labels come from wherever the pipeline already has signal — the
heuristic gates (`quality_score.passes`), a curated seed corpus vs raw
crawl, or hand labels. `weak_labels_from_heuristics` wires the first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weak_labels_from_heuristics(df: DataFrame, text_col: str = "text",
                                id_col: str = "doc_id") -> DataFrame:
    """(id, text, label): 1.0 where the heuristic quality AND repetition
    gates both pass, else 0.0 — the standard bootstrap when no curated
    positive corpus exists."""
    from oxbow_spark.operators import text as text_ops

    q = text_ops.quality_score(df, text_col, id_col).select(
        id_col, F.col("passes").alias("_q"))
    r = text_ops.repetition_stats(df, text_col, id_col).select(
        id_col, F.col("repetition_ok").alias("_r"))
    return (df.select(id_col, text_col)
            .join(q, id_col).join(r, id_col)
            .select(id_col, text_col,
                    (F.col("_q") & F.col("_r")).cast("double")
                    .alias("label")))


def train_quality_classifier(labeled: DataFrame, text_col: str = "text",
                             num_features: int = 1 << 18,
                             reg_param: float = 1e-3, max_iter: int = 50):
    """Fit the tokenize → hash → logistic-regression pipeline on a
    (text, label) frame; returns the fitted PipelineModel. Hashing keeps
    the feature space fixed (no vocab broadcast); L2 via ``reg_param``."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(inputCol=text_col, outputCol="_words",
                         pattern=r"\s+")
    tf = HashingTF(inputCol="_words", outputCol="features",
                   numFeatures=num_features)
    lr = LogisticRegression(featuresCol="features", labelCol="label",
                            regParam=reg_param, maxIter=max_iter,
                            standardization=False)
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def score_quality(model, df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, quality_prob): P(label=1) per document from a fitted
    pipeline — one transform, JVM-side end to end."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(df.select(id_col, text_col))
    return out.select(
        id_col,
        F.round(vector_to_array("probability")[1], 6)
        .alias("quality_prob"))


def classifier_filter(df: DataFrame, model=None, threshold: float = 0.5,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Keep documents with P(quality) ≥ threshold. Trains on heuristic
    weak labels when no model is given (self-bootstrapping; pass a model
    fit on a curated seed corpus for the production setup)."""
    if model is None:
        model = train_quality_classifier(
            weak_labels_from_heuristics(df, text_col, id_col), text_col)
    scores = score_quality(model, df, text_col, id_col)
    keep = scores.where(F.col("quality_prob") >= threshold).select(id_col)
    return df.join(keep, id_col, "left_semi")
