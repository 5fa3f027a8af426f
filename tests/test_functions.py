"""langid / perplexity / quality-heuristic unit tests (pandas level)."""

import numpy as np
import pandas as pd

from pii_redaction_data_pipeline_spark.config import PipelineConfig
from pii_redaction_data_pipeline_spark.datagen import (
    CLEAN_SENTENCES,
    NON_ENGLISH_SENTENCES,
)
from pii_redaction_data_pipeline_spark.functions.langid import langid_frame
from pii_redaction_data_pipeline_spark.functions.perplexity import default_model
from pii_redaction_data_pipeline_spark.functions.quality import (
    repetition_frac_series,
)

CFG = PipelineConfig()


def test_langid_english_pool():
    lid = langid_frame(pd.Series(list(CLEAN_SENTENCES)))
    # every clean sentence must pass the lang gate
    gated = (lid.lang != "en") & (lid.lang_conf >= CFG.lang_min_conf)
    assert not gated.any()


def test_langid_non_english_pool():
    lid = langid_frame(pd.Series(list(NON_ENGLISH_SENTENCES)))
    gated = (lid.lang != "en") & (lid.lang_conf >= CFG.lang_min_conf)
    assert gated.all(), lid[~gated]


def test_langid_empty_and_gibberish():
    lid = langid_frame(pd.Series(["", "zzqp brt krgl", None]))
    assert (lid.lang == "en").all()
    assert (lid.lang_conf == 0).all()


def test_ppl_separation():
    m = default_model()
    clean = [m.ppl(s) for s in CLEAN_SENTENCES]
    rng = np.random.default_rng(7)
    gib = [
        m.ppl(" ".join("".join(rng.choice(list("bcdfghjklmnpqrstvwxz"), size=6)) for _ in range(10)))
        for _ in range(20)
    ]
    assert max(clean) < CFG.max_ppl * 0.6, max(clean)
    assert min(gib) > CFG.max_ppl * 1.5, min(gib)


def test_ppl_short_neutral():
    m = default_model()
    assert m.ppl("") == 1.0
    assert m.ppl("a") < CFG.max_ppl  # single padded char scores low, never gates


def test_repetition_stat():
    rep = repetition_frac_series(
        pd.Series(
            [
                "the cat sat " * 12,
                "a perfectly normal sentence with no repeated trigrams at all",
                "one two",  # < 3 words
            ]
        )
    )
    assert rep.iloc[0] > CFG.max_top3gram_frac
    assert rep.iloc[1] <= CFG.max_top3gram_frac
    assert rep.iloc[2] == 0.0
