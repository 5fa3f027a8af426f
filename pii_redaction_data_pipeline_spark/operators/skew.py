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
) -> DataFrame:
    """Hash-repartition on (key, salt) so one hot key spreads over
    `salt_buckets` partitions. Correct ONLY for per-row stages; windows
    over `key` must repartition unsalted afterwards (two-phase)."""
    salt = F.pmod(F.xxhash64(key, F.monotonically_increasing_id()), F.lit(salt_buckets))
    df = df.withColumn("_salt", salt)
    if num_partitions:
        out = df.repartition(num_partitions, key, "_salt")
    else:
        out = df.repartition(key, "_salt")
    return out.drop("_salt")
