"""Linear quality classifier — the GPT-3 / CCNet curation component.

GPT-3's data pipeline (Brown et al. 2020, Appendix A) filtered Common
Crawl with a LINEAR classifier trained to separate a curated reference
corpus (positives) from raw crawl (negatives), then kept documents via a
Pareto lottery over the classifier score so the tail isn't cut off
cliff-sharp. fastText-style hashed-n-gram linear models remain the
standard because they score at I/O speed — exactly what a 100-TB pass
needs.

This module implements that shape on Spark ML primitives: word + bigram
hashing-trick features → logistic regression (distributed L-BFGS) →
per-row probability, plus the deterministic Pareto-lottery filter
(hash-seeded per document, so membership is reproducible across reruns
and partitionings like every other sampling decision in this repo).

Scale shape: training is MLlib's data-parallel L-BFGS over the feature
matrix (each iteration one pass, tree-aggregated gradients); scoring is
a pure per-row map (hash features + dot product) — no shuffle, no
state. The model is a plain coefficient vector; broadcast cost is
``2 × hash_dim`` doubles for the two hash spaces (word + bigram) —
2^17 doubles ≈ 1 MB at the default ``hash_dim = 2^16``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HASH_DIM = 1 << 16


def _feature_pipeline(text_col: str, hash_dim: int):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, VectorAssembler

    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol="_words",
        pattern=r"[^a-zA-Z0-9]+",
        toLowercase=True,
    )
    big = NGram(n=2, inputCol="_words", outputCol="_bigrams")
    tf1 = HashingTF(
        inputCol="_words", outputCol="_f1", numFeatures=hash_dim
    )
    tf2 = HashingTF(
        inputCol="_bigrams", outputCol="_f2", numFeatures=hash_dim
    )
    asm = VectorAssembler(inputCols=["_f1", "_f2"], outputCol="_features")
    return Pipeline(stages=[tok, big, tf1, tf2, asm])


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    hash_dim: int = DEFAULT_HASH_DIM,
    reg_param: float = 1e-4,
    max_iter: int = 30,
):
    """Train the linear quality model on (text, 0/1-label) rows.

    Returns a fitted PipelineModel; apply it with ``score_quality``,
    which surfaces P[label=1] as the plain double ``quality_prob``
    column (the ML vector plumbing stays internal). Deterministic given
    the input data (L-BFGS from a zero init; no sampling anywhere).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    feats = _feature_pipeline(text_col, hash_dim)
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    # fit the feature stages once, CACHE the featurized frame, then fit
    # the LR on it — without this every L-BFGS iteration re-runs
    # tokenize/ngram/hash over the corpus (measured 9 min for 30
    # iterations on 5k docs; cached it's seconds). Training data should
    # be a SAMPLE anyway (the GPT-3 recipe trains on ~10^5-10^6 docs
    # and scores everything) — the scorer, not the trainer, is the
    # 100-TB pass.
    from pyspark.ml import PipelineModel

    base = labeled.select(
        text_col, F.col(label_col).cast("double").alias(label_col)
    )
    feat_model = feats.fit(base)
    featurized = feat_model.transform(base).select(
        "_features", label_col
    ).cache()
    try:
        lr_model = lr.fit(featurized)
    finally:
        featurized.unpersist()
    return PipelineModel(stages=[feat_model, lr_model])


def train_curation_classifier(
    curated: DataFrame,
    raw: DataFrame,
    text_col: str,
    hash_dim: int = DEFAULT_HASH_DIM,
    **kw,
):
    """The GPT-3 recipe: positives = a curated reference corpus,
    negatives = raw crawl. Balances nothing (logistic regression
    handles mild imbalance; heavily imbalanced callers should sample
    the larger side first)."""
    labeled = curated.select(
        F.col(text_col), F.lit(1.0).alias("_label")
    ).unionByName(raw.select(F.col(text_col), F.lit(0.0).alias("_label")))
    return train_quality_classifier(
        labeled, text_col, "_label", hash_dim=hash_dim, **kw
    )


def model_text_col(model) -> str:
    """The text input column a trained model expects — fixed at
    training time by the tokenizer stage (callers renaming their text
    column must alias to this)."""
    feats = model.stages[0]
    return feats.stages[0].getInputCol()


def score_quality(model, df: DataFrame, text_col: str) -> DataFrame:
    """Add ``quality_prob`` to ``df`` — a pure per-row map (hash
    features + one dot product against the broadcast coefficients)."""
    from pyspark.ml.functions import vector_to_array

    cols = df.columns
    return model.transform(df).select(
        *cols,
        vector_to_array(F.col("probability"))
        .getItem(1)
        .alias("quality_prob"),
    )


def pareto_lottery_filter(
    scored: DataFrame,
    pkey: str,
    alpha: float = 9.0,
    prob_col: str = "quality_prob",
    salt: str = "|pareto",
) -> DataFrame:
    """GPT-3's acceptance rule (Brown et al. 2020 A.1): keep a document
    iff ``score > 1 - X`` where ``X ~ Pareto(alpha)`` — high-scoring
    docs almost always survive, low scorers survive occasionally, so
    the kept set isn't a hard cliff at a threshold. The paper's
    ``np.random.pareto(alpha)`` is the LOMAX form (support x >= 0,
    mass near 0), so most draws demand a near-1 score and the
    occasional x > 1 waves anything through. The lottery draw is
    DETERMINISTIC per (document, salt): the repo's Fibonacci-mixed
    hash uniform feeds the Lomax inverse-CDF
    ``X = u^(-1/alpha) - 1``, so membership is reproducible across
    reruns, cluster sizes and partitionings.

    With alpha=9 (the paper's value) the mean draw is 1/8 and
    ``P[keep] = (2 - score)^-9`` rises steeply with the score: a
    0.95-scorer survives ~2 times in 3, a 0.87-scorer ~1 in 3, and a
    0.1-scorer ~1 in 300. Pure per-row expression — zero shuffle.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    from pg_vectorize_spark.operators.curate import (
        MIX_BITS,
        sample_priority_expr,
    )

    # u in (0, 1]: shift the integer hash by +1 so u is never 0
    u = (
        sample_priority_expr(F.col(pkey), salt) + F.lit(1)
    ).cast("double") / F.lit(float(1 << MIX_BITS))
    x = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)  # Lomax(alpha), x >= 0
    return scored.filter(F.col(prob_col) > F.lit(1.0) - x)
