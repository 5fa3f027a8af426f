"""Report sink (S7 analog) + lineage status API (§3.2 analog)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pii_redaction_data_pipeline_spark.sources.lineage import LineageStore
from pii_redaction_data_pipeline_spark.sources.report import (
    quality_report,
    write_quality_report,
)


def test_quality_report_parts(spark, tiny_annotated):
    ann = spark.read.parquet(tiny_annotated[0])
    parts = quality_report(ann)
    summary = parts["summary"].first()
    assert summary["rows_in"] == ann.count()
    assert 0 < summary["rows_kept"] < summary["rows_in"]
    assert abs(summary["keep_rate"] - summary["rows_kept"] / summary["rows_in"]) < 1e-4

    reasons = {(r["reason"], r["lang"]): r["n"] for r in parts["reasons"].collect()}
    # grand total row equals total dropped-reason instances
    total = ann.select(F.explode("drop_reasons")).count()
    assert reasons[("ALL", "ALL")] == total
    # every taxonomy reason present in fixtures appears
    assert any(k[0] == "too_short" for k in reasons)

    scrub = {r["pii_type"]: r["n_redactions"] for r in parts["scrub"].collect()}
    assert scrub and all(n > 0 for n in scrub.values())


def test_write_quality_report_csv(spark, tiny_annotated, tmp_path):
    ann = spark.read.parquet(tiny_annotated[0])
    out = str(tmp_path / "report")
    write_quality_report(ann, out)
    for part in ("summary", "reasons", "scrub"):
        got = spark.read.option("header", "true").csv(f"{out}/{part}")
        assert got.count() > 0


def test_lineage_status_api(spark, tiny_annotated):
    store = LineageStore(spark, tiny_annotated[1])
    all_rows = store.status().collect()
    assert len(all_rows) == 16
    one = store.status(run_id="test-run").collect()
    assert len(one) == 16
    none = store.status(run_id="no-such-run").collect()
    assert none == []
    # newest-first ordering by finished_seq
    seqs = [r["finished_seq"] for r in all_rows]
    assert seqs == sorted(seqs, reverse=True)
