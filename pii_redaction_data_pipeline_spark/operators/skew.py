"""Skew-aware repartitioning helpers.

The reference has no skew handling — a giant document simply runs long in
one Lambda (SURVEY.md §4). At 10^12-turn scale a heavily skewed
conversation (1000+ turns) concentrated on one shuffle partition stalls
the stage, so turn-level (per-row, embarrassingly parallel) stages run
under a SALTED conv_id partitioning, and only conversation-window stages
pay for the unsalted conv_id shuffle. AQE's skew-join splitting handles
the join side; this handles the agg/window side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    key: str = "conv_id",
    salt_buckets: int = 8,
    num_partitions: int | None = None,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Hash-repartition on (key, salt) so one hot key spreads over
    `salt_buckets` partitions. Correct ONLY for per-row stages; windows
    over `key` must repartition unsalted afterwards (two-phase).

    The salt is a DETERMINISTIC function of row content — never
    monotonically_increasing_id or rand: a nondeterministic
    partitioning expression can lose or duplicate rows when a fetch
    failure forces a PARTIAL map-stage recompute (the SPARK-23207 class
    of bug; Spark guards its own round-robin repartition against it,
    not user salts). `salt_cols` names the columns hashed (pass the
    cheap per-row discriminator, e.g. ["conv_id", "turn_idx"]); the
    default hashes every hashable column — xxhash64 rejects MapType, so
    map columns are skipped — and rows identical across all hashed
    columns share a salt bucket, which is harmless for spreading a hot
    key."""
    if salt_cols is None:
        salt_cols = [
            f.name for f in df.schema.fields
            if "map<" not in f.dataType.simpleString()
        ]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets)
    )
    df = df.withColumn("_salt", salt)
    if num_partitions:
        out = df.repartition(num_partitions, key, "_salt")
    else:
        out = df.repartition(key, "_salt")
    return out.drop("_salt")
