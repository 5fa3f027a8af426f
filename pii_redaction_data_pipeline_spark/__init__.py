"""PySpark-native quality-filter + PII-scrub engine.

A from-scratch reimplementation of the semantics of
miniarjabri/PII-Redaction-Data-Pipeline (a serverless AWS document
extract->detect->redact app) as a batch quality-filter pipeline over
partitioned tables of multi-turn transcripts — expressed entirely in the
public PySpark DataFrame API + vectorized pandas/Arrow UDFs.

Reference mapping (see SURVEY.md for the full operator inventory):
  - document -> transcript row (conv_id, turn_idx, role, text, tool, ts)
  - Textract extract        -> text normalization      (functions.normalize)
  - Comprehend PHI detection -> regex PII detection    (functions.scrub)
  - redaction rasterizer    -> span-masking scrubber   (functions.scrub)
  - workflow status / manifest -> lineage checkpoint   (sources.lineage)
  - Step Functions state machine -> plans.pipeline (one Spark job)
"""

__version__ = "0.1.0"

from pii_redaction_data_pipeline_spark.config import PipelineConfig
from pii_redaction_data_pipeline_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark", "__version__"]
