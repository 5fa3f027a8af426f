"""plans/select.py curate_training_corpus: composition semantics on a
planted corpus — contamination excluded, DSIR top-k respected, learned
gate drops the junk register, Pareto default replayable."""

import pytest
from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.plans.select import curate_training_corpus

_CLEAN_VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi"
).split()
_JUNK_VOCAB = ["qzjxv%d" % i for i in range(20)]


def _mk_docs(spark, n=80):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(n):
        rows.append((i, " ".join(rng.choices(_CLEAN_VOCAB, k=rng.randint(10, 24)))))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def parts(spark):
    docs = _mk_docs(spark)
    bench = docs.filter("doc_id % 9 = 2").select("text")
    target = docs.filter("doc_id % 4 = 1").select("text")
    junk = spark.createDataFrame(
        [(" ".join(_JUNK_VOCAB[i % 20 : i % 20 + 5] * 3),) for i in range(30)],
        "text string",
    )
    return docs, bench, target, junk


def test_contaminated_docs_never_selected(spark, parts):
    docs, bench, target, _ = parts
    out = curate_training_corpus(docs, bench, target, k_top=20)
    ids = {r.doc_id for r in out.collect()}
    # every benchmark carve member self-hits its own 8-grams
    assert not any(i % 9 == 2 for i in ids), ids
    assert len(ids) == 20


def test_columns_and_topk(spark, parts):
    docs, bench, target, _ = parts
    out = curate_training_corpus(docs, bench, target, k_top=5)
    assert set(out.columns) == {"doc_id", "n_grams", "weight", "text"}
    assert out.count() == 5


def test_learned_threshold_gate_drops_junk_register(spark, parts):
    docs, bench, target, junk = parts
    # corrupt the corpus with junk-register docs at high ids; they must
    # be cut by the learned gate even if DSIR would otherwise pass them
    junk_docs = junk.withColumn(
        "doc_id", F.lit(1000) + F.monotonically_increasing_id()
    ).select("doc_id", "text")
    corpus = docs.unionByName(junk_docs)
    # k_top exceeds the corpus so DSIR selects EVERYTHING — the learned
    # gate must be the stage that cuts the junk register
    out = curate_training_corpus(
        corpus,
        bench,
        target,
        k_top=200,
        quality_positives=docs.select("text"),
        quality_negatives=junk,
        q_threshold=0.5,
    )
    rows = out.collect()
    assert rows and all(r.doc_id < 1000 for r in rows), sorted(
        r.doc_id for r in rows
    )[-5:]
    assert len(rows) >= 60  # the clean register survives the gate
    assert all(r.q_score > 0.5 for r in rows)


def test_pareto_gate_default_is_deterministic(spark, parts):
    docs, bench, target, junk = parts
    kw = dict(
        k_top=20, quality_positives=docs.select("text"), quality_negatives=junk
    )
    a = sorted(
        r.doc_id
        for r in curate_training_corpus(docs, bench, target, **kw).collect()
    )
    b = sorted(
        r.doc_id
        for r in curate_training_corpus(
            docs.repartition(7), bench, target, **kw
        ).collect()
    )
    assert a == b and len(a) > 0


def test_positives_without_negatives_rejected(spark, parts):
    docs, bench, target, _ = parts
    with pytest.raises(ValueError, match="quality_negatives"):
        curate_training_corpus(
            docs, bench, target, k_top=5, quality_positives=docs.select("text")
        )


def test_negatives_without_positives_rejected(spark, parts):
    """Symmetric validation: negatives alone must raise too — silently
    skipping the gate would return an ungated corpus the caller believes
    quality-filtered (round-5 review finding)."""
    docs, bench, target, _ = parts
    with pytest.raises(ValueError, match="quality_positives"):
        curate_training_corpus(
            docs, bench, target, k_top=5, quality_negatives=docs.select("text")
        )
