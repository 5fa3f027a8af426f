"""Train/test decontamination: engine output pinned against a scalar
Python re-derivation of the word-8-gram overlap protocol."""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pii_redaction_data_pipeline_spark.operators.decontaminate import (
    contamination_flags,
    decontaminate,
)

BENCH = [
    "the mitochondria is the powerhouse of the cell according to textbooks",
    "what is the capital of france answer paris of course",
]


def _grams(text: str, k: int = 8) -> set[str]:
    w = text.lower().split()
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)} if len(w) >= k else set()


def _corpus():
    # doc 0: embeds a full benchmark sentence mid-text -> contaminated
    # doc 1: clean long text, zero benchmark grams
    # doc 2: shares only a short prefix of a benchmark sentence -> clean at k=8
    # doc 3: shorter than 8 words -> zero grams, never flagged
    return [
        (0, "students wrote that the mitochondria is the powerhouse of the cell "
            "according to textbooks and exams repeat it"),
        (1, "completely unrelated prose about spark plans shuffles and the "
            "catalyst optimizer rewriting predicates across joins"),
        (2, "the mitochondria is the powerhouse of everything else entirely "
            "different after the seventh word here"),
        (3, "too short to matter"),
    ]


def test_flags_match_scalar_reference(spark):
    corpus = spark.createDataFrame(
        pd.DataFrame(_corpus(), columns=["doc_id", "text"])
    )
    bench = spark.createDataFrame(pd.DataFrame({"text": BENCH}))
    got = {
        r.doc_id: (r.n_grams, r.n_hits, r.contaminated)
        for r in contamination_flags(corpus, bench).collect()
    }
    bench_grams = set().union(*(_grams(t) for t in BENCH))
    for did, text in _corpus():
        g = _grams(text)
        hits = len(g & bench_grams)
        assert got[did] == (len(g), hits, hits > 0), f"doc {did}"
    # the planted overlap structure itself (guards fixture rot):
    assert got[0][2] and not got[1][2] and not got[2][2] and not got[3][2]
    assert got[0][1] >= 3  # full 10-word benchmark sentence -> >=3 shared 8-grams


def test_decontaminate_removes_only_contaminated(spark):
    corpus = spark.createDataFrame(
        pd.DataFrame(_corpus(), columns=["doc_id", "text"])
    )
    bench = spark.createDataFrame(pd.DataFrame({"text": BENCH}))
    kept = sorted(r.doc_id for r in decontaminate(corpus, bench).collect())
    assert kept == [1, 2, 3]
    # max_hits loosening keeps everything below the threshold
    kept_loose = sorted(
        r.doc_id for r in decontaminate(corpus, bench, max_hits=10).collect()
    )
    assert kept_loose == [0, 1, 2, 3]
