"""spark-submit entrypoint: arg parsing, config overrides, zip packaging,
and a local end-to-end run through job.main()."""

import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pii_redaction_data_pipeline_spark import job


def test_parse_and_config_overrides():
    args = job.parse_args(
        [
            "--input", "/i", "--output", "/o", "--lineage", "/l",
            "--run-id", "r1", "--n-buckets", "8",
            "--allowed-langs", "en,fr", "--max-ppl", "25.5",
        ]
    )
    cfg = job.build_config(args)
    assert cfg.n_buckets == 8
    assert cfg.allowed_langs == ("en", "fr")
    assert cfg.max_ppl == 25.5
    # defaults untouched
    assert cfg.min_words == 3
    assert cfg.normalize_unicode is True

    args2 = job.parse_args(
        ["--input", "/i", "--output", "/o", "--lineage", "/l",
         "--no-normalize-unicode"]
    )
    assert job.build_config(args2).normalize_unicode is False


def test_pyfiles_zip_self_contained(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import make_pyfiles_zip

    out = make_pyfiles_zip.build(str(tmp_path / "pkg.zip"))
    names = zipfile.ZipFile(out).namelist()
    # every runtime module ships; no caches
    for mod in (
        "plans/pipeline.py", "functions/fused.py", "functions/scrub.py",
        "functions/langid.py", "functions/perplexity.py", "functions/quality.py",
        "operators/windows.py", "operators/skew.py", "sources/tables.py",
        "sources/lineage.py", "job.py", "session.py", "config.py",
    ):
        assert f"pii_redaction_data_pipeline_spark/{mod}" in names, mod
    assert not any("__pycache__" in n for n in names)


def test_job_main_end_to_end(tmp_path, spark):
    from pii_redaction_data_pipeline_spark.datagen import write_parquet

    tp, _ = write_parquet("tiny", str(tmp_path))
    summary = job.main(
        [
            "--input", tp,
            "--output", str(tmp_path / "annotated"),
            "--lineage", str(tmp_path / "lineage"),
            "--run-id", "t-job",
        ]
    )
    assert summary["processed_buckets"] == list(range(16))
    out = spark.read.parquet(str(tmp_path / "annotated"))
    assert out.count() > 0
    assert "keep" in out.columns and "scrubbed_text" in out.columns
    # second invocation resumes to a no-op
    summary2 = job.main(
        [
            "--input", tp,
            "--output", str(tmp_path / "annotated"),
            "--lineage", str(tmp_path / "lineage"),
            "--run-id", "t-job",
        ]
    )
    assert summary2["processed_buckets"] == []


def test_job_report_scoped_to_run(tmp_path, spark):
    """--report must exclude stale buckets left in a reused output path
    by a previous run-id (dynamic overwrite only replaces touched
    buckets)."""
    from pyspark.sql import functions as F

    from pii_redaction_data_pipeline_spark.datagen import write_parquet

    tp, _ = write_parquet("tiny", str(tmp_path))
    out, lin = str(tmp_path / "annotated"), str(tmp_path / "lineage")

    # run A: full input, all 16 buckets
    job.main(["--input", tp, "--output", out, "--lineage", lin, "--run-id", "A"])

    # run B: a single conversation -> a strict subset of buckets
    full = spark.read.parquet(tp)
    one_conv = full.filter(
        F.col("conv_id") == full.select("conv_id").first()["conv_id"]
    )
    small_in = str(tmp_path / "small_in")
    one_conv.write.parquet(small_in)
    rep = str(tmp_path / "report")
    job.main(
        ["--input", small_in, "--output", out, "--lineage", lin,
         "--run-id", "B", "--report", rep]
    )

    got = spark.read.option("header", "true").csv(f"{rep}/summary").first()
    # the report counts only run B's buckets — the buckets run B actually
    # overwrote hold exactly run B's rows
    n_b = int(got["rows_in"])
    assert n_b == one_conv.count(), (n_b, one_conv.count())
