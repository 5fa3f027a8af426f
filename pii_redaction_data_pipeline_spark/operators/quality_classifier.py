"""Learned quality classifier: fastText/GPT-3-style linear filter.

The heuristic rules (functions/quality.py) and the KN fluency gate
(functions/perplexity.py) are FIXED scorers; web-scale curation
pipelines additionally train a cheap linear classifier on
curated-vs-random text and keep documents by its score — GPT-3's
quality filter (Brown et al. 2020, appendix A) and CCNet's fastText
filter are the published templates. No reference analog (the reference
redacts PII, it does not curate training data); this sits beside
DSIR (operators/dsir.py) as the DISCRIMINATIVE counterpart of its
generative bag-of-grams likelihood ratio.

Scale design.

  train      on SAMPLES, not the corpus: a linear model saturates at
             ~10^6 rows, so the positive side is the curated domain
             sample and the negative side a deterministic sample of
             the raw corpus (operators/sampling.py). Each L-BFGS
             iteration is one treeAggregate whose per-partition state
             is a dense gradient of n_features doubles (2 MB at the
             2^18 default) — bounded by D, never by corpus size.
  featurize  JVM end to end: the gram arrays are Catalyst expressions
             (split/NGram/concat) and HashingTF buckets them without a
             Python round-trip. Feature width is FIXED (hashing trick),
             so the model artifact is <= 2 MB dense regardless of
             vocabulary and broadcasts like the KN table.
  score      one narrow pass over the corpus — model.transform is
             JVM-side, no shuffle, no Python; the keep predicate
             composes with other pushed filters.
  keep gate  GPT-3 keeps a document iff
             np.random.pareto(alpha) > 1 - score; `pareto_quality_gate`
             replaces the RNG with the repo's deterministic sha256
             uniform (operators/sampling.py contract: deterministic,
             partitioning-independent, engine-replayable), applying
             the Lomax inverse CDF (1-u)^(-1/alpha) - 1 to it. Same
             distribution, replayable selection.

Correctness: value-checked by pytest (tests/test_quality_classifier.py:
planted separable corpora -> held-out F1, gate keep-rate against the
closed-form Lomax tail, partitioning invariance). Iterative training is
not SQL-expressible, so there is deliberately no driver oracle entry —
the same standing as the streaming surface (SURVEY.md §5).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.operators.sampling import (
    _HEX_SPAN,
    sample_bucket_col,
)

_WORDS = "_qc_words"
_GRAMS = "_qc_grams"
FEATURES_COL = "_qc_features"


def _gram_arrays(df: DataFrame, text_col: str, use_bigrams: bool) -> DataFrame:
    """text -> array of word uni(+bi)grams, normalized exactly like the
    dedup/decontaminate/DSIR family (lower + whitespace collapse) so one
    mental model covers every gram-based operator."""
    words = F.split(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " "
    )
    df = df.withColumn(_WORDS, words)
    if use_bigrams:
        from pyspark.ml.feature import NGram

        df = NGram(n=2, inputCol=_WORDS, outputCol="_qc_bi").transform(df)
        df = df.withColumn(_GRAMS, F.concat(F.col(_WORDS), F.col("_qc_bi"))).drop(
            "_qc_bi"
        )
    else:
        df = df.withColumn(_GRAMS, F.col(_WORDS))
    return df.drop(_WORDS)


def featurize(
    df: DataFrame,
    text_col: str = "text",
    n_features: int = 2 ** 18,
    use_bigrams: bool = True,
) -> DataFrame:
    """Adds the fixed-width hashed bag-of-grams vector (FEATURES_COL).
    All JVM: Catalyst gram arrays + HashingTF (hashing trick — feature
    width is capacity-planned up front, never vocabulary-dependent)."""
    from pyspark.ml.feature import HashingTF

    df = _gram_arrays(df, text_col, use_bigrams)
    tf = HashingTF(inputCol=_GRAMS, outputCol=FEATURES_COL, numFeatures=n_features)
    return tf.transform(df).drop(_GRAMS)


@dataclass(frozen=True)
class QualityClassifier:
    """The fitted model WITH its featurization settings — scoring must
    hash grams exactly as training did, so the two travel together (a
    silent use_bigrams/n_features mismatch would scramble buckets
    without any width error)."""

    model: object  # pyspark.ml LogisticRegressionModel
    n_features: int
    use_bigrams: bool


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    n_features: int = 2 ** 18,
    use_bigrams: bool = True,
    max_iter: int = 50,
    reg_param: float = 1e-4,
) -> QualityClassifier:
    """Fit the linear filter: positives = the register you want more of
    (curated sample), negatives = a deterministic sample of the raw
    corpus (the CCNet/GPT-3 recipe). Returns the fitted model bundled
    with its featurization settings (coefficients <= n_features doubles
    — the broadcastable model artifact)."""
    from pyspark.ml.classification import LogisticRegression

    train = positives.select(
        F.col(text_col).alias("text"), F.lit(1.0).alias("label")
    ).unionByName(
        negatives.select(F.col(text_col).alias("text"), F.lit(0.0).alias("label"))
    )
    feat = featurize(train, "text", n_features, use_bigrams)
    lr = LogisticRegression(
        featuresCol=FEATURES_COL,
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    return QualityClassifier(lr.fit(feat), n_features, use_bigrams)


def score_quality(
    df: DataFrame,
    clf: QualityClassifier,
    text_col: str = "text",
    out_col: str = "q_score",
) -> DataFrame:
    """Adds P(curated | text) as `out_col`. One narrow JVM pass —
    featurize + model.transform + vector_to_array slice; every input
    column passes through untouched, the ml intermediates are dropped."""
    from pyspark.ml.functions import vector_to_array

    model = clf.model
    feat = featurize(df, text_col, clf.n_features, clf.use_bigrams)
    scored = model.transform(feat)
    return scored.withColumn(
        out_col, vector_to_array(F.col(model.getProbabilityCol()))[1]
    ).drop(
        FEATURES_COL,
        model.getRawPredictionCol(),
        model.getProbabilityCol(),
        model.getPredictionCol(),
    )


def _deterministic_uniform(key_cols, seed: int) -> Column:
    """[0, 1) uniform from the sampling family's sha256 bucket — the
    hex prefix IS a uniform draw over [0, 16^8) (operators/sampling.py
    rationale: deterministic, partitioning-independent, replayable)."""
    return F.conv(sample_bucket_col(key_cols, seed), 16, 10).cast("double") / F.lit(
        float(_HEX_SPAN)
    )


def pareto_quality_gate(
    df: DataFrame,
    score_col: str = "q_score",
    key_cols=("doc_id",),
    alpha: float = 9.0,
    seed: int = 0,
) -> DataFrame:
    """GPT-3's noisy keep rule, made deterministic: keep a document iff
    pareto_draw > 1 - score, with the draw derived from the row's own
    key instead of an RNG — draw = (1-u)^(-1/alpha) - 1 (Lomax inverse
    CDF) over the sha256 uniform. P(keep | score s) = (2 - s)^(-alpha),
    so score ~1 keeps almost surely while low scores retain a heavy-
    tailed trickle (the published rationale: don't starve the corpus of
    everything the classifier dislikes). Pure Catalyst expressions —
    the gate is a codegen'd predicate, no UDF, no shuffle."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    u = _deterministic_uniform(list(key_cols), seed)
    draw = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return df.filter(F.col(score_col) + draw > F.lit(1.0))
