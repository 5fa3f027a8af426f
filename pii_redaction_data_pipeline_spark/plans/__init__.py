from pii_redaction_data_pipeline_spark.plans.pipeline import (
    annotate,
    run_pipeline,
)

__all__ = ["annotate", "run_pipeline"]
