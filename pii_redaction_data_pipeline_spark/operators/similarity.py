"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline; random-hyperplane
LSH bucketing as the scale path (candidates shrink ~bucket-fold, join is
an equi-join on bucket signature — no O(n^2) shuffle at 100 TB).

The dot products stay JVM-side via F.zip_with + F.aggregate (whole-stage
codegen); the only Python is the LSH signature (one numpy matmul per
Arrow batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    probes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe row.

    probes is small -> broadcast; ranking uses (rounded sim desc, id asc)
    so ties are deterministic across engines.
    """
    cand = df.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("nbr_vec"),
    )
    pr = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("probe_vec"),
    )
    joined = cand.join(F.broadcast(pr), F.col("nbr_id") != F.col("probe_id"))
    sim = F.round(cosine_similarity_col(F.col("probe_vec"), F.col("nbr_vec")), round_digits)
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("nbr_id"))
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "nbr_id", "sim")
    )


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    sample_n: int = 2048,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7451,
) -> np.ndarray:
    """Deterministic spherical-k-means coarse quantizer for IVF.

    Trains on a bounded, deterministically-chosen sample (first sample_n
    rows by id) collected to the driver — the ONLY driver-side collect in
    the similarity module, capped at sample_n rows regardless of table
    size. NOTE: this collect runs EAGERLY at call time (a Spark job at
    DataFrame-construction time), and when the sample has fewer than
    n_cells rows the quantizer trains that many centroids, not n_cells
    (duplicate init rows collapse). Centroids are L2-normalized;
    assignment is max dot product (cosine). Returns (n_cells, dim)
    float64. Raises ValueError on an empty corpus.
    """
    pdf = (
        df.orderBy(id_col)
        .limit(sample_n)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .toPandas()
    )
    if len(pdf) == 0:
        raise ValueError("train_ivf_centroids: empty corpus (no vectors to train on)")
    mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    if mat.ndim != 2:
        raise ValueError("train_ivf_centroids: non-uniform embedding dimensions")
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = mat[rng.permutation(len(mat))[:n_cells]].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def make_ivf_assign_udf(centroids: np.ndarray, nprobe: int = 1):
    """pandas UDF: vector -> its nprobe nearest cells (cosine), nearest
    first. Centroids are closure-captured (broadcast with the serialized
    UDF, loaded once per executor)."""
    cent = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # np.stack raises on an empty Arrow batch
            return pd.Series([], dtype=object)
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cent.T  # (batch, n_cells)
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top), index=vecs.index)

    return assign


def ivf_ann_topk(
    df: DataFrame,
    probes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into n_cells
    inverted lists (each vector in exactly one cell), probe the nprobe
    nearest cells per query, exact cosine re-rank the candidates.

    At scale: assignment is a per-row pandas UDF with broadcast centroids
    (zero shuffle); the candidate join is an equi-join on `cell`
    restricted to the probes' cells, so a corpus written partitioned/
    bucketed by cell gets partition-pruned reads — the classic FAISS-IVF
    layout expressed relationally.
    """
    cent = train_ivf_centroids(df, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    assign1 = make_ivf_assign_udf(cent, nprobe=1)
    assignp = make_ivf_assign_udf(cent, nprobe=nprobe)

    cand = df.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("nbr_vec"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    pr = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("probe_vec"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    joined = (
        cand.join(F.broadcast(pr), "cell")
        .filter(F.col("nbr_id") != F.col("probe_id"))
        .select("probe_id", "probe_vec", "nbr_id", "nbr_vec")
    )
    sim = F.round(cosine_similarity_col(F.col("probe_vec"), F.col("nbr_vec")), round_digits)
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("nbr_id"))
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "nbr_id", "sim")
    )


def make_lsh_signature_udf(dim: int, n_planes: int = 16, seed: int = 4321):
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float64)

    @F.pandas_udf(T.LongType())
    def lsh_sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # np.stack raises on an empty Arrow batch
            return pd.Series([], dtype=np.int64)
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights, index=vecs.index)

    return lsh_sig


def lsh_ann_topk(
    df: DataFrame,
    probes: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing an LSH bucket with
    the probe in ANY of n_tables hash tables, then exact cosine re-rank.

    At scale this is n_tables equi-joins on (table, bucket) instead of a
    full cross join; recall is tunable via n_planes/n_tables.
    """
    sigs = [make_lsh_signature_udf(dim, n_planes, seed=4321 + t) for t in range(n_tables)]

    def with_buckets(d, prefix):
        cols = [F.struct(F.lit(t).alias("tbl"), sigs[t](F.col(vec_col)).alias("bkt"))
                for t in range(n_tables)]
        return d.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).cast("array<double>").alias(f"{prefix}_vec"),
            F.explode(F.array(*cols)).alias("b"),
        ).select(f"{prefix}_id", f"{prefix}_vec", "b.tbl", "b.bkt")

    cand = with_buckets(df, "nbr")
    pr = with_buckets(probes, "probe")
    joined = (
        cand.join(F.broadcast(pr), ["tbl", "bkt"])
        .filter(F.col("nbr_id") != F.col("probe_id"))
        .select("probe_id", "probe_vec", "nbr_id", "nbr_vec")
        .distinct()
    )
    sim = F.round(cosine_similarity_col(F.col("probe_vec"), F.col("nbr_vec")), round_digits)
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("nbr_id"))
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "nbr_id", "sim")
    )
