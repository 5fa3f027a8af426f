"""Learned quality classifier: held-out separation, scoring pass-through,
and the deterministic Pareto keep gate (closed-form Lomax tail)."""

import random

import pytest
from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.operators.quality_classifier import (
    pareto_quality_gate,
    score_quality,
    train_quality_classifier,
)

_CLEAN_VOCAB = (
    "the quick brown fox jumps over lazy dog please restart service and "
    "tell me whether error message still appears we reviewed report "
    "agreed next steps for release thank you your patience while look "
    "into this issue data pipeline finished nightly run all tables were "
    "written without errors"
).split()

def _docs(vocab, n, seed):
    rng = random.Random(seed)
    return [" ".join(rng.choices(vocab, k=rng.randint(8, 24))) for _ in range(n)]


@pytest.fixture(scope="module")
def model_and_holdout(spark):
    # the junk side is the CANONICAL planted register
    # (datagen.junk_register) — the same one the llm_curation driver
    # oracle trains against, so this module's F1/margin evidence backs
    # that oracle's provable-gate argument
    from pii_redaction_data_pipeline_spark.datagen import junk_register

    junk = junk_register(400)
    pos = _docs(_CLEAN_VOCAB, 300, 1)
    neg = junk[:300]
    model = train_quality_classifier(
        spark.createDataFrame([(t,) for t in pos], "text string"),
        spark.createDataFrame([(t,) for t in neg], "text string"),
        n_features=2 ** 15,
    )
    hold_pos = _docs(_CLEAN_VOCAB, 100, 3)
    hold_neg = junk[300:]
    return model, hold_pos, hold_neg


def test_holdout_f1(spark, model_and_holdout):
    model, hold_pos, hold_neg = model_and_holdout
    df = spark.createDataFrame(
        [(t, 1) for t in hold_pos] + [(t, 0) for t in hold_neg], "text string, y int"
    )
    rows = score_quality(df, model).select("y", "q_score").collect()
    tp = sum(1 for r in rows if r.y == 1 and r.q_score > 0.5)
    fp = sum(1 for r in rows if r.y == 0 and r.q_score > 0.5)
    fn = sum(1 for r in rows if r.y == 1 and r.q_score <= 0.5)
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, (tp, fp, fn)


def test_score_passthrough_and_range(spark, model_and_holdout):
    model, hold_pos, _ = model_and_holdout
    df = spark.createDataFrame(
        [(i, t, "meta") for i, t in enumerate(hold_pos[:20])],
        "doc_id long, text string, extra string",
    )
    out = score_quality(df, model)
    assert set(out.columns) == {"doc_id", "text", "extra", "q_score"}
    rows = out.collect()
    assert len(rows) == 20
    assert all(0.0 <= r.q_score <= 1.0 for r in rows)


def test_scoring_deterministic_across_partitionings(spark, model_and_holdout):
    model, hold_pos, hold_neg = model_and_holdout
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(hold_pos + hold_neg)], "doc_id long, text string"
    )
    a = {r.doc_id: r.q_score for r in score_quality(df.repartition(1), model).collect()}
    b = {r.doc_id: r.q_score for r in score_quality(df.repartition(9), model).collect()}
    assert a == b


def _score_frame(spark, score, n):
    return spark.createDataFrame(
        [(i, float(score)) for i in range(n)], "doc_id long, q_score double"
    )


def test_pareto_gate_matches_lomax_tail(spark):
    """P(keep | s) = (2 - s)^(-alpha): s=0.999/alpha=9 keeps ~99.1%,
    s=0.001 keeps ~0.2%. 2000 deterministic draws per side."""
    hi = pareto_quality_gate(_score_frame(spark, 0.999, 2000)).count()
    lo = pareto_quality_gate(_score_frame(spark, 0.001, 2000)).count()
    assert hi / 2000 > 0.95, hi
    assert lo / 2000 < 0.05, lo


def test_pareto_gate_deterministic_and_partition_invariant(spark):
    df = _score_frame(spark, 0.6, 500)
    ids1 = sorted(r.doc_id for r in pareto_quality_gate(df.repartition(2)).collect())
    ids2 = sorted(r.doc_id for r in pareto_quality_gate(df.repartition(11)).collect())
    assert ids1 == ids2 and len(ids1) > 0
    # expected keep fraction at s=0.6: (1.4)^-9 ~ 4.8%
    assert 0.0 < len(ids1) / 500 < 0.15


def test_pareto_gate_seed_changes_selection(spark):
    df = _score_frame(spark, 0.6, 500)
    a = {r.doc_id for r in pareto_quality_gate(df, seed=0).collect()}
    b = {r.doc_id for r in pareto_quality_gate(df, seed=1).collect()}
    assert a != b


def test_pareto_gate_rejects_bad_alpha(spark):
    with pytest.raises(ValueError):
        pareto_quality_gate(_score_frame(spark, 0.5, 1), alpha=0.0)


def test_featurize_matches_scoring_indices(spark):
    """Training's SparseVector (featurize) and scoring's index arrays
    (hashed_gram_indices) must land every gram in the same bucket with
    the same multiplicity, or the broadcast coefficients are applied to
    scrambled features. (Consistency is by construction — both consume
    the same Catalyst hash — but this pins it against refactors.)"""
    import collections

    from pii_redaction_data_pipeline_spark.operators.quality_classifier import (
        FEATURES_COL,
        featurize,
        hashed_gram_indices,
    )

    texts = [
        "the quick brown fox",
        "hello world hello world hello",
        "single",
        "",
        "unicode héllo ☃ grams",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    nf = 1 << 10
    feat = {r.doc_id: r[FEATURES_COL] for r in featurize(df, "text", nf).collect()}
    idx = {
        r.doc_id: r.idx
        for r in hashed_gram_indices(df, "text", nf, True, "idx").collect()
    }
    for i in range(len(texts)):
        got = {int(k): float(v) for k, v in collections.Counter(idx[i]).items()}
        sv = feat[i]
        want = {int(k): float(v) for k, v in zip(sv.indices, sv.values)}
        assert got == want, (i, texts[i])


def test_score_composes_with_pipeline_observation(
    spark, tiny_annotated, model_and_holdout
):
    """Regression (round-4 VERDICT #1): scoring via MLlib model.transform
    crashed with NotSerializableException(ObservationManager) in any
    session that had run the pipeline's Observation-based lineage. The
    broadcast-coefficient scorer must compose with run_pipeline in ONE
    session — tiny_annotated guarantees the Observation is registered
    before this scoring job runs."""
    model, hold_pos, _ = model_and_holdout
    df = spark.createDataFrame([(t,) for t in hold_pos[:10]], "text string")
    rows = score_quality(df, model).collect()
    assert len(rows) == 10
    assert all(0.0 <= r.q_score <= 1.0 for r in rows)


def test_classifier_eq_and_hash_are_identity(model_and_holdout):
    """QualityClassifier holds an ndarray field, so the dataclass must
    opt out of generated __eq__/__hash__ (eq=False): comparing two
    classifiers would raise ValueError (ambiguous array truth) and
    hashing would raise TypeError — both worked under the previous
    MLlib-model field's identity semantics (round-5 review finding)."""
    import dataclasses

    model, _, _ = model_and_holdout
    clone = dataclasses.replace(model)
    assert model == model
    assert model != clone  # identity, not value, like any model handle
    assert isinstance(hash(model), int)
    assert len({model, clone}) == 2
