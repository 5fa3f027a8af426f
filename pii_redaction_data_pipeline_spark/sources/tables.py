"""Table IO abstraction: Iceberg when its runtime jar is on the
classpath, Parquet directory layout otherwise.

The reference's "table format" is an S3 prefix convention plus a DynamoDB
row per workflow (SURVEY.md S2/S9). Here a table is an Iceberg table
(production target: partitioned by bucket(conv_id), snapshot-based
resume) or — in this offline container, where iceberg-spark-runtime jars
are unavailable — a Parquet directory partitioned by the same bucket
column, with dynamic partition overwrite standing in for Iceberg's
overwritePartitions. The pipeline only talks to this facade, so the
format is a deployment decision, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "part_bucket"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def with_bucket(df: DataFrame, n_buckets: int, key: str = "conv_id") -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


class TableIO:
    def __init__(self, spark: SparkSession, n_buckets: int = 16):
        self.spark = spark
        self.n_buckets = n_buckets
        self.use_iceberg = iceberg_available(spark)

    def read(self, path: str) -> DataFrame:
        if (
            self.use_iceberg
            and not path.endswith(".parquet")
            and self._iceberg_layout(path)
        ):
            # a REAL Iceberg target: read errors PROPAGATE. The old
            # blanket except->parquet fallback would silently re-scan an
            # Iceberg table's location as raw parquet on any transient
            # failure — returning deleted and superseded rows from all
            # snapshots with no error.
            return self.spark.read.format("iceberg").load(path)
        return self.spark.read.parquet(path)

    def _iceberg_layout(self, path: str) -> bool:
        """Is `path` an Iceberg target? Catalog identifiers (no '/')
        always are; a filesystem path is decided by the table-format
        marker — the `metadata` directory — probed through the Hadoop
        FS (a driver-side existence check, no scan). An unprobeable
        path falls back to the plain-parquet read, whose own error
        surfaces the real problem."""
        if "/" not in path:
            return True
        try:
            from pii_redaction_data_pipeline_spark.sources.fsutil import (
                hadoop_fs,
            )

            _, fs, p = hadoop_fs(self.spark, path.rstrip("/") + "/metadata")
            return bool(fs.exists(p))
        except Exception:
            return False

    def write_bucketed(self, df: DataFrame, path: str, overwrite_partitions: bool = True):
        """Write partitioned by part_bucket. overwrite_partitions=True
        (the resume contract): only the buckets present in `df` are
        replaced (Iceberg overwritePartitions / Parquet dynamic mode).
        False: a FULL overwrite — the whole table is replaced, so
        buckets absent from `df` are deleted rather than left as ghost
        rows from a previous run (the parameter was previously accepted
        and ignored)."""
        if BUCKET_COL not in df.columns:
            df = with_bucket(df, self.n_buckets)
        w = df.write.mode("overwrite")
        if overwrite_partitions:
            w = w.option("partitionOverwriteMode", "dynamic")
        else:
            w = w.option("partitionOverwriteMode", "static")
        w.partitionBy(BUCKET_COL).parquet(path)

    def append(self, df: DataFrame, path: str):
        df.write.mode("append").parquet(path)

    def write_conv_bucketed_table(
        self, df: DataFrame, table: str, sort_within: bool = True
    ):
        """Persist as a Spark BUCKETED table on conv_id (bucketBy +
        sortBy(conv_id, turn_idx) + saveAsTable): the scan of such a
        table reports HashPartitioning(conv_id), so downstream
        conversation windows run with ZERO exchange — the scan's bucket
        metadata satisfies the window's required distribution (pinned by
        tests/test_plans.py::test_bucketed_table_windows_need_no_exchange).
        This is the resume/incremental fast path: re-processing the
        engine's own output never pays the conv_id shuffle again. The
        Iceberg equivalent is a bucket(conv_id) partition transform +
        sorted write order."""
        w = df.write.bucketBy(self.n_buckets, "conv_id")
        if sort_within:
            w = w.sortBy("conv_id", "turn_idx")
        w.format("parquet").mode("overwrite").saveAsTable(table)

    def read_table(self, table: str) -> DataFrame:
        return self.spark.table(table)
