"""Run-quality report sink — the reference's Excel report analog.

The reference writes a 3-sheet xlsx per document (LINES/FORMS/TABLES
with confidences, reference backend/src/lambda/textract-output.py:78-149)
and a Manifest summary per batch (pii-output.py:91-93). The engine-level
analog is a 3-part CSV report per run over the annotated table:

  summary/   one row: rows_in, rows_kept, keep_rate, langs seen
  reasons/   drop-reason x language matrix (GROUPING-SETS-style rollup)
  scrub/     PII-type redaction counts in the KEPT rows (the annotated
             table nulls scrub_counts for dropped rows by design — a
             dropped row's text never ships, so its redactions are not
             part of the delivered product; same convention as the
             per-bucket lineage scrub_counts)

CSV (not xlsx) because the report is itself data — the reference's xlsx
exists for humans clicking in a console; downstream of a Spark pipeline
the consumer is another query. All three parts are plain aggregations of
the written output with column pruning, so the report costs three
narrow scans, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_report(annotated: DataFrame) -> dict[str, DataFrame]:
    """-> {'summary': df, 'reasons': df, 'scrub': df} for one run."""
    summary = annotated.agg(
        F.count("*").alias("rows_in"),
        F.sum(F.col("keep").cast("long")).alias("rows_kept"),
        F.round(F.avg(F.col("keep").cast("double")), 6).alias("keep_rate"),
        F.countDistinct("conv_id").alias("n_conversations"),
        F.countDistinct("lang").alias("n_langs"),
    )
    reasons = (
        annotated.select("lang", F.explode("drop_reasons").alias("reason"))
        .rollup("reason", "lang")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("reason", F.lit("ALL")).alias("reason"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n",
        )
        .orderBy("reason", "lang")
    )
    scrub = (
        annotated.select(F.explode("scrub_counts").alias("pii_type", "n"))
        .groupBy("pii_type")
        .agg(F.sum("n").alias("n_redactions"))
        .orderBy("pii_type")
    )
    return {"summary": summary, "reasons": reasons, "scrub": scrub}


def write_quality_report(annotated: DataFrame, out_dir: str) -> None:
    """Write the three report parts as single-file CSVs under out_dir/."""
    for name, df in quality_report(annotated).items():
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("header", "true")
            .csv(f"{out_dir}/{name}")
        )
