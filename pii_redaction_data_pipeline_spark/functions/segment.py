"""Sentence segmentation + greedy fixed-budget packing.

Mirrors the reference's Comprehend pre-processing (reference
backend/src/segment.py:82-114): split text into sentences, hard-break
any sentence longer than `seg_len` into fixed-width chunks
(break_sentence, segment.py:82-88), then greedily pack sentences into
segments — when adding the next sentence would exceed `seg_len`, flush
the current segment and start a new one (segment.py:103-110). The
reference's default budget is the Comprehend 40 KB/20k-char limit
(reference backend/src/lambda/textract-output.py:167-174).

The reference segments with scispacy/simple_sentence_segment (not
available offline); we use a deterministic regex segmenter with the same
contract (sentence spans covering the text in order). Packing semantics
— including the quirk that the trailing partial segment is always
emitted, even when empty — match the reference exactly; see
tests/test_functions.py.

Per-turn transcript texts are far below the budget, so in the pipeline
this collapses to one segment per turn (SURVEY.md §2.7); it exists as a
first-class operator for document-shaped corpora.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# sentence boundary: terminator run + following whitespace, or a blank line
_BOUNDARY_RE = re.compile(r"(?<=[.!?])\s+|\n{2,}")

DEFAULT_SEG_LEN = 20_000  # chars; reference Comprehend limit analog


def split_sentences(text: str) -> list[str]:
    """Boundary-split covering the whole text in order (keeps whitespace
    attached to the preceding sentence, like span-based segmenters)."""
    if not text:
        return []
    out = []
    last = 0
    for m in _BOUNDARY_RE.finditer(text):
        out.append(text[last : m.end()])
        last = m.end()
    if last < len(text):
        out.append(text[last:])
    return out


def break_sentence(s: str, seg_len: int) -> list[str]:
    """Fixed-width chunks (reference segment.py:82-88)."""
    points = list(range(0, len(s), seg_len))
    if points and points[-1] != len(s):
        points.append(len(s))
    return [s[points[i] : points[i + 1]] for i in range(len(points) - 1)]


def pack_segments(text: str, seg_len: int = DEFAULT_SEG_LEN) -> list[str]:
    """Greedy packing (reference segment.py:90-111): flush when the next
    sentence would overflow; always emit the trailing segment."""
    sentences: list[str] = []
    for s in split_sentences(text):
        if len(s) > seg_len:
            sentences += break_sentence(s, seg_len)
        else:
            sentences.append(s)
    segments: list[str] = []
    segment = ""
    for s in sentences:
        if len(segment) + len(s) > seg_len:
            segments.append(segment)
            segment = ""
        segment += s
    segments.append(segment)
    return segments


def make_segment_udf(seg_len: int = DEFAULT_SEG_LEN):
    """pandas UDF: text -> array<string> of packed segments."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def segment_udf(texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(lambda t: pack_segments(t, seg_len))

    return segment_udf
