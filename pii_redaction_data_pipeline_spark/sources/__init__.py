from pii_redaction_data_pipeline_spark.sources.tables import (
    TableIO,
    iceberg_available,
)
from pii_redaction_data_pipeline_spark.sources.lineage import LineageStore

__all__ = ["TableIO", "iceberg_available", "LineageStore"]
