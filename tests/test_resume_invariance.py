"""Resume + partition-invariance tests (SURVEY.md §5 items 4-5).

Generalizes the reference's status-driven incremental progress loop
(textract-bulk.py:108-118): a killed run must resume from the lineage
checkpoint and produce byte-identical results; results must not depend
on input partition count or salting.
"""

import pytest
from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.config import PipelineConfig
from pii_redaction_data_pipeline_spark.operators.skew import salted_repartition
from pii_redaction_data_pipeline_spark.plans.pipeline import annotate, run_pipeline


def _fingerprint(df):
    """Order-insensitive digest of the full result set."""
    cols = [
        "conv_id",
        "turn_idx",
        "keep",
        F.concat_ws(",", "drop_reasons"),
        F.coalesce("scrubbed_text", F.lit("\x00")),
        F.coalesce(
            F.to_json(F.array_sort(F.map_entries("scrub_counts"))), F.lit("\x00")
        ),
    ]
    row = df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count("*").alias("n"),
    ).first()
    return (row.h, row.n)


def test_kill_and_resume_identical(spark, tiny, tmp_path):
    out1, lin1 = str(tmp_path / "a"), str(tmp_path / "la")
    out2, lin2 = str(tmp_path / "b"), str(tmp_path / "lb")
    run_pipeline(spark, tiny[0], out1, lin1, run_id="full")
    with pytest.raises(RuntimeError):
        run_pipeline(spark, tiny[0], out2, lin2, run_id="crash", fail_after_buckets=4)
    res = run_pipeline(spark, tiny[0], out2, lin2, run_id="crash")
    assert res["resumed"]
    assert _fingerprint(spark.read.parquet(out1)) == _fingerprint(
        spark.read.parquet(out2)
    )
    # completed run is a no-op
    res2 = run_pipeline(spark, tiny[0], out2, lin2, run_id="crash")
    assert res2["processed_buckets"] == []


def test_partition_count_invariance(spark, tiny):
    """Also pins the ADAPTIVE phase-1 both ways: 2 partitions < 2x cores
    takes the salted-repartition path, 37 >= 2x cores skips phase 1
    entirely — identical results either way."""
    cfg = PipelineConfig()
    src = spark.read.parquet(tiny[0])
    a = annotate(src.repartition(2), cfg, spark)
    b = annotate(src.repartition(37), cfg, spark)
    assert _fingerprint(a) == _fingerprint(b)


def test_salting_invariance(spark, tiny):
    """Salted repartition (turn-level stages) must not change results —
    guards the two-phase skew refactor."""
    cfg = PipelineConfig()
    src = spark.read.parquet(tiny[0])
    a = annotate(src, cfg, spark)
    b = annotate(salted_repartition(src, salt_buckets=8), cfg, spark)
    assert _fingerprint(a) == _fingerprint(b)


def test_lineage_paths_identical(spark, tiny, tmp_path, monkeypatch):
    """The two per-bucket lineage-metrics paths — aggregates riding the
    write job's Observation vs the column-pruned re-read of the written
    table — must persist identical lineage rows. Pins both branches of
    the LINEAGE_OBS_MAX_EXPRS gate with the same 8-bucket config (the
    observe side fits the budget; the re-read side is forced by zeroing
    it)."""
    import dataclasses

    from pii_redaction_data_pipeline_spark.plans import pipeline as P

    cfg = dataclasses.replace(PipelineConfig(), n_buckets=8)

    def lineage_rows(lin_path):
        rows = (
            spark.read.parquet(lin_path)
            .select(
                "partition_id", "rows_in", "rows_out",
                F.coalesce(
                    F.to_json(F.array_sort(F.map_entries("drop_reason_counts"))),
                    F.lit("\x00"),
                ).alias("r"),
                F.coalesce(
                    F.to_json(F.array_sort(F.map_entries("scrub_counts"))),
                    F.lit("\x00"),
                ).alias("s"),
                "status",
            )
            .collect()
        )
        return sorted(map(tuple, rows))

    out1, lin1 = str(tmp_path / "obs"), str(tmp_path / "obs-lin")
    run_pipeline(spark, tiny[0], out1, lin1, run_id="r", cfg=cfg)

    monkeypatch.setattr(P, "LINEAGE_OBS_MAX_EXPRS", 0)
    out2, lin2 = str(tmp_path / "rr"), str(tmp_path / "rr-lin")
    run_pipeline(spark, tiny[0], out2, lin2, run_id="r", cfg=cfg)

    assert lineage_rows(lin1) == lineage_rows(lin2)
    assert _fingerprint(spark.read.parquet(out1)) == _fingerprint(
        spark.read.parquet(out2)
    )
