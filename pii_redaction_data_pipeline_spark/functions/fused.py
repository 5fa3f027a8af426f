"""Fused per-turn annotation UDF: langid + scrub + perplexity + repetition
in ONE Arrow exchange.

The pipeline's four Python stages (langid, scrub, ppl, repetition) are
independent per-row transforms of the same `text` column. Run as four
separate pandas UDFs, each becomes its own ArrowEvalPython operator — the
text column crosses the JVM<->Python Arrow pipe four times and every
batch pays Python dispatch four times. At 10^12-turn scale that transfer
is pure waste: fusing them into one struct-returning UDF moves the same
compute but 4x less data across the pipe.

Semantics are IDENTICAL to the individual UDFs (shared implementations
from functions.langid / functions.scrub / functions.quality /
functions.perplexity); the golden-fixture equality tests pin this.

The ppl input is the scrubbed text with mask tokens stripped, whitespace
collapsed, and space-trimmed — previously three JVM regexp passes, here
one Python pass with the exact same ASCII \\s semantics (Java regex \\s
== Python re.ASCII \\s == [ \\t\\n\\x0b\\f\\r]).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pii_redaction_data_pipeline_spark.functions.langid import langid_frame
from pii_redaction_data_pipeline_spark.functions.perplexity import (
    CharTrigramLM,
    default_model,
)
from pii_redaction_data_pipeline_spark.functions.quality import (
    repetition_frac_series,
    text_stats_frame,
)
from pii_redaction_data_pipeline_spark.functions.scrub import scrub_frame

# mirrors plans.pipeline.MASK_TOKEN_RE + the \s+ collapse + trim chain
_MASK_RE = re.compile(r"\[REDACTED [A-Z_]+\]")
_WS_RE = re.compile(r"\s+", re.ASCII)


def ppl_input_series(scrubbed: pd.Series) -> pd.Series:
    """Exact Python replica of the former JVM chain:
    trim(regexp_replace(regexp_replace(scrubbed, MASK, ' '), '\\s+', ' '))."""

    def strip_one(t: str) -> str:
        if "[REDACTED " in t:
            t = _MASK_RE.sub(" ", t)
        return _WS_RE.sub(" ", t).strip(" ")

    return scrubbed.map(strip_one)


ANNOTATE_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("lang_conf", T.DoubleType()),
        T.StructField("scrubbed_text", T.StringType()),
        T.StructField("scrub_counts", T.MapType(T.StringType(), T.IntegerType())),
        T.StructField("ppl", T.DoubleType()),
        T.StructField("rep_frac", T.DoubleType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("symbol_ratio", T.DoubleType()),
    ]
)


def annotate_frame(texts: pd.Series, logp=None) -> pd.DataFrame:
    lid = langid_frame(texts)
    scr = scrub_frame(texts)
    if logp is None:
        model = default_model()
    else:
        model = CharTrigramLM.__new__(CharTrigramLM)
        model.logp = logp
    ppl = model.ppl_series(ppl_input_series(scr["scrubbed_text"].fillna("")))
    rep = repetition_frac_series(texts)
    stats = text_stats_frame(texts)
    return pd.DataFrame(
        {
            "lang": lid["lang"],
            "lang_conf": lid["lang_conf"],
            "scrubbed_text": scr["scrubbed_text"],
            "scrub_counts": scr["scrub_counts"],
            "ppl": ppl,
            "rep_frac": rep,
            "n_chars": stats["n_chars"].astype("int32"),
            "n_words": stats["n_words"].astype("int32"),
            "symbol_ratio": stats["symbol_ratio"],
        },
        index=texts.index,
    )


def make_annotate_udf(spark=None):
    """pandas UDF: text -> struct<lang, lang_conf, scrubbed_text,
    scrub_counts, ppl, rep_frac>. The KN log-prob table is broadcast once."""
    bc = None
    if spark is not None:
        bc = spark.sparkContext.broadcast(default_model().logp)

    @F.pandas_udf(ANNOTATE_SCHEMA)
    def annotate_udf(texts: pd.Series) -> pd.DataFrame:
        return annotate_frame(texts, logp=bc.value if bc is not None else None)

    return annotate_udf
