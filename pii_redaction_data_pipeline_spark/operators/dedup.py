"""Deduplication operators for large-scale corpus curation.

Beyond the reference's single dedup mechanism (the processed_boxes set
that stops double-redaction, redact.py:169-193), a 100 TB training-data
pipeline needs corpus-level dedup. All operators are DataFrame-first:

  exact          hash-groupBy on a normalized fingerprint (no Python)
  minhash_lsh    shingle -> minhash signature (vectorized numpy) ->
                 banded LSH bucket join -> exact-jaccard verify
  simhash        64-bit sign-of-weighted-sum signature + chunk banding
  ngram_jaccard  exact word-k-gram jaccard via explode + self-join
                 (the small-scale ground truth for the sketches)

Scale notes: the LSH band join is an equi-join on (band_id, band_hash)
— shuffle-partitionable, no O(n^2) stage; candidate pairs are verified
with exact jaccard only within buckets. At 100 TB the band join is the
only wide stage and it broadcasts nothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- exact dedup -----------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adds fingerprint + is_dup_exact (true for every row after the
    lowest-id keeper of an identical normalized text)."""
    fp = F.md5(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))))
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    return (
        df.withColumn("fingerprint", fp)
        .withColumn("is_dup_exact", F.row_number().over(w) > 1)
    )


# --- minhash ---------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _hash_params(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    # stable 64-bit FNV-1a per shingle (no PYTHONHASHSEED dependence)
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = np.uint64(0xCBF29CE484222325)
        for byte in g.encode("utf-8"):
            h = np.uint64((int(h) ^ byte) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return np.unique(out)


def make_minhash_udf(n_hashes: int = 64, shingle_k: int = 3, seed: int = 1234):
    a, b = _hash_params(n_hashes, seed)
    a_u = a.astype(np.uint64)
    b_u = b.astype(np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        sigs = []
        for t in texts.fillna(""):
            sh = _shingle_hashes(t, shingle_k)
            # (a*x + b) mod p, vectorized over (n_hashes, n_shingles)
            vals = (np.outer(a_u, sh) + b_u[:, None]) % np.uint64(_MERSENNE)
            sigs.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(sigs, index=texts.index)

    return minhash_udf


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 1234,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH, verified with
    exact shingle jaccard. Returns (id_a, id_b, jaccard) with id_a<id_b."""
    rows = n_hashes // bands
    sig = make_minhash_udf(n_hashes, shingle_k, seed)
    with_sig = df.select(F.col(id_col).alias("id"), sig(F.col(text_col)).alias("sig"))

    # the band join carries ONLY (band, band_hash, id) — never the text.
    # Texts re-join by id for the verify stage, so the 16x band explode
    # shuffles ~24 bytes/row instead of the whole corpus.
    band_idx = F.explode(
        F.sequence(F.lit(0), F.lit(bands - 1))
    ).alias("band")
    banded = with_sig.select("id", "sig", band_idx).withColumn(
        "band_hash", F.xxhash64(F.slice("sig", F.col("band") * rows + 1, rows))
    ).drop("sig")
    lhs = banded.select("band", "band_hash", F.col("id").alias("id_a"))
    rhs = banded.select("band", "band_hash", F.col("id").alias("id_b"))
    cand = (
        lhs.join(rhs, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    texts = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    cand = (
        cand.join(texts.select(F.col("id").alias("id_a"), F.col("txt").alias("txt_a")), "id_a")
        .join(texts.select(F.col("id").alias("id_b"), F.col("txt").alias("txt_b")), "id_b")
    )
    jac = make_jaccard_udf(shingle_k)
    return (
        cand.withColumn("jaccard", jac(F.col("txt_a"), F.col("txt_b")))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def make_jaccard_udf(shingle_k: int = 3):
    @F.pandas_udf(T.DoubleType())
    def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.zeros(len(a))
        for i, (x, y) in enumerate(zip(a.fillna(""), b.fillna(""))):
            sx = set(_shingle_hashes(x, shingle_k).tolist())
            sy = set(_shingle_hashes(y, shingle_k).tolist())
            u = len(sx | sy)
            out[i] = len(sx & sy) / u if u else 0.0
        return pd.Series(out, index=a.index)

    return jaccard_udf


# --- simhash ---------------------------------------------------------------


def make_simhash_udf(seed: int = 99):
    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("")):
            words = t.lower().split()
            if not words:
                continue
            acc = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for w_ in words:
                h = np.uint64(0xCBF29CE484222325)
                for byte in w_.encode("utf-8"):
                    h = np.uint64((int(h) ^ byte) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                bits = (h >> shifts) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            sh = np.uint64(0)
            for bpos in range(64):
                if acc[bpos] > 0:
                    sh |= np.uint64(1) << np.uint64(bpos)
            out[i] = sh.astype(np.int64)
        return pd.Series(out, index=texts.index)

    return simhash_udf


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash: band the 64-bit signature into 4
    16-bit chunks (pigeonhole: hamming<=3 pairs share >=1 chunk), join
    on chunk, verify exact hamming distance JVM-side."""
    sim = make_simhash_udf()
    sdf = df.select(F.col(id_col).alias("id"), sim(F.col(text_col)).alias("sh"))
    chunks = sdf.select(
        "id", "sh", F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright("sh", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ck"))
            for c in range(4)
        ])).alias("b"),
    ).select("id", "sh", "b.chunk", "b.ck")
    lhs = chunks.select("chunk", "ck", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    rhs = chunks.select("chunk", "ck", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        lhs.join(rhs, ["chunk", "ck"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --- exact n-gram jaccard (explode/join ground truth) -----------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-k-gram jaccard for all pairs sharing >=1 shingle.
    Distributed: explode distinct shingles, equi-join on shingle,
    group by pair. No UDFs — fully JVM-side."""
    words = F.split(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " ")
    n = F.size(words)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("g"))
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), "g")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
