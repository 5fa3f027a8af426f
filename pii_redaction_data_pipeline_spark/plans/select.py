"""Composed training-corpus selection: decontaminate -> DSIR -> learned
quality gate, as ONE reusable plan.

This is the chain a training-data user actually runs end-to-end (the
GPT-3 data pipeline, Brown et al. 2020, appendix A+C; CCNet; DSIR, Xie
et al. 2023): drop benchmark-contaminated documents, importance-resample
toward a target register, then gate by a learned quality score. Each
stage exists as an independent operator (operators/decontaminate.py,
operators/dsir.py, operators/quality_classifier.py); this module owns
their composition so the plan-level decisions — where to truncate
lineage, what broadcasts, which columns survive each hop — are made
once, not re-derived by every caller. Driver oracle: `llm_curation`
(__spark_entry__.py) value-checks the composed chain against a DuckDB
replay; tests/test_plans.py::test_llm_curation_composition_plan pins
the plan shape.

Reference analog: the single Step Functions execution that chains
extract -> detect -> redact in one resumable run (reference
backend/lib/cdk-stepfunctions-stack.js:315-328) — here the states are
corpus-selection stages instead of document-processing ones.

Scale shape (the plan at 100 TB):
  * decontaminate's keep-list is lineage-truncated (ids only, 8 B/doc)
    so DSIR's three corpus reads (stats, per-doc grams, target carve)
    do not each re-run the contamination groupBy chain — zero hash
    exchanges added over DSIR-alone (plan-pinned).
  * DSIR's stats table and k-th-weight threshold broadcast; the only
    corpus-wide exchanges are its own gram aggregations.
  * the learned gate is a broadcast coefficient vector applied by one
    vectorized pandas UDF over Catalyst-hashed gram indices — no MLlib
    in the scoring path, no shuffle, composes with Observation-bearing
    sessions (operators/quality_classifier.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.operators.decontaminate import decontaminate
from pii_redaction_data_pipeline_spark.operators.dsir import dsir_select
from pii_redaction_data_pipeline_spark.operators.quality_classifier import (
    QualityClassifier,
    pareto_quality_gate,
    score_quality,
    train_quality_classifier,
)


def curate_training_corpus(
    corpus: DataFrame,
    benchmark: DataFrame,
    target: DataFrame,
    k_top: int,
    quality_positives: DataFrame | None = None,
    quality_negatives: DataFrame | None = None,
    classifier: QualityClassifier | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    contamination_k: int = 8,
    q_threshold: float | None = None,
    pareto_alpha: float = 9.0,
    seed: int = 0,
) -> DataFrame:
    """-> the selected documents: (id_col, text_col, n_grams, weight
    [, q_score]) — decontaminated, DSIR-top-k toward `target`, and (when
    a classifier is given or trainable) quality-gated.

    benchmark          eval-set text to exclude by word-k-gram overlap
                       (GPT-3 appendix C protocol).
    target             the register to resample toward (DSIR).
    classifier         a pre-fitted QualityClassifier; OR pass
                       quality_positives + quality_negatives to fit one
                       in-plan (train_quality_classifier). With neither,
                       the quality stage is skipped.
    q_threshold        keep iff q_score > q_threshold (hard gate). When
                       None (default) the GPT-3 Pareto gate applies
                       instead: keep iff score + lomax_draw > 1 with the
                       deterministic sha256 draw keyed on id_col —
                       replayable, partitioning-independent.
    """
    clean = decontaminate(
        corpus,
        benchmark,
        id_col=id_col,
        text_col=text_col,
        k=contamination_k,
        materialize_keep=True,
    )
    sel = dsir_select(
        clean, target, k_top=k_top, id_col=id_col, text_col=text_col
    ).filter("selected")
    # dsir_select returns (id, n_grams, weight, selected) — re-attach the
    # text for the scoring stage (and for the caller: selected docs
    # without their text would force every consumer into this same join)
    out = sel.drop("selected").join(
        corpus.select(id_col, text_col), id_col
    )
    if classifier is not None and (
        quality_positives is not None or quality_negatives is not None
    ):
        # ambiguous: a pre-fitted model AND training samples — silently
        # ignoring the samples would gate with a model the caller may
        # believe was refit on them
        raise ValueError(
            "pass either a pre-fitted classifier OR "
            "quality_positives/quality_negatives to fit one, not both"
        )
    if classifier is None and (
        quality_positives is not None or quality_negatives is not None
    ):
        # symmetric validation: EITHER sample alone is a misconfiguration
        # (silently skipping the gate when only negatives arrive would
        # return an ungated corpus the caller believes quality-filtered)
        if quality_positives is None or quality_negatives is None:
            raise ValueError(
                "quality_positives and quality_negatives must be passed "
                "together (the CCNet/GPT-3 recipe trains curated-vs-random)"
            )
        classifier = train_quality_classifier(
            quality_positives, quality_negatives, text_col=text_col
        )
    if classifier is None:
        return out
    scored = score_quality(out, classifier, text_col=text_col)
    if q_threshold is not None:
        return scored.filter(F.col("q_score") > q_threshold)
    return pareto_quality_gate(
        scored, key_cols=(id_col,), alpha=pareto_alpha, seed=seed
    )
