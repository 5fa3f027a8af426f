"""Deterministic heuristic language ID (fastText-style gate, offline).

The reference hardcodes LanguageCode='en' when launching Comprehend PHI
detection (backend/src/lambda/pii-detection.py:88) — i.e. its language
"model" is a constant. We generalize to a real (if small) classifier:
script detection (CJK / Cyrillic ranges) + stopword evidence for five
Latin-script languages. fastText's lid.176 binary is not available in
this offline container, so this fully deterministic classifier is the
shipped model; it shares the fastText contract (label + confidence) so a
real model can be swapped in via the same UDF factory.

Vectorized: every signal is a `pd.Series.str.count` over the Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# language -> characteristic function words (lowercase). Deliberately
# small and high-precision; confidence is share of stopword hits.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to", "you", "it", "that", "for", "with"),
    "fr": ("le", "la", "les", "et", "est", "vous", "je", "une", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ich", "ein", "mit", "zu"),
    "es": ("el", "los", "es", "que", "una", "por", "para", "con", "las", "usted"),
    "it": ("il", "che", "di", "non", "per", "sono", "una", "con", "questo", "della"),
}
LATIN_LANGS: tuple[str, ...] = tuple(STOPWORDS)

_WORD_RES = {
    lang: r"\b(?:" + "|".join(words) + r")\b" for lang, words in STOPWORDS.items()
}
_CJK_RE = r"[一-鿿぀-ヿ]"
_CYRILLIC_RE = r"[Ѐ-ӿ]"
_ALPHA_RE = r"[^\W\d_]"  # unicode letters


def langid_frame(texts: pd.Series) -> pd.DataFrame:
    """-> DataFrame(lang:str, lang_conf:float64) per input row."""
    s = texts.fillna("").str.lower()
    n_chars = s.str.len().to_numpy().clip(min=1)
    cjk = s.str.count(_CJK_RE).to_numpy()
    cyr = s.str.count(_CYRILLIC_RE).to_numpy()
    letters = s.str.count(_ALPHA_RE).to_numpy()

    counts = np.stack(
        [s.str.count(_WORD_RES[lang]).to_numpy() for lang in LATIN_LANGS], axis=1
    ).astype(np.float64)
    total = counts.sum(axis=1)
    best_idx = counts.argmax(axis=1)  # ties -> first (fixed LATIN_LANGS order)
    best = counts[np.arange(len(s)), best_idx]
    with np.errstate(divide="ignore", invalid="ignore"):
        conf = np.where(total > 0, best / np.maximum(total, 1.0), 0.0)

    lang = np.array(LATIN_LANGS, dtype=object)[best_idx]
    # no stopword evidence at all -> unknown English-ish with low confidence
    lang = np.where(total == 0, "en", lang)
    conf = np.where(total == 0, 0.0, conf)

    # script overrides (high confidence by construction)
    cjk_frac = cjk / n_chars
    # `letters` already includes Cyrillic — share of letters that are Cyrillic
    cyr_frac = np.divide(cyr, np.maximum(letters, 1))
    is_cjk = cjk_frac > 0.15
    is_cyr = cyr_frac > 0.5
    lang = np.where(is_cyr, "ru", lang)
    conf = np.where(is_cyr, np.maximum(cyr_frac, 0.9), conf)
    lang = np.where(is_cjk, "zh", lang)
    conf = np.where(is_cjk, np.maximum(cjk_frac + 0.5, 0.9).clip(max=1.0), conf)

    return pd.DataFrame(
        {"lang": lang.astype(object), "lang_conf": conf.astype(np.float64)},
        index=texts.index,
    )


_LANGID_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("lang_conf", T.DoubleType()),
    ]
)


def make_langid_udf():
    @F.pandas_udf(_LANGID_SCHEMA)
    def langid_udf(texts: pd.Series) -> pd.DataFrame:
        return langid_frame(texts)

    return langid_udf
