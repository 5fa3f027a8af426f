"""Phase-level profiling of the pipeline at a given parallelism.

Usage: python scripts/profile_pipeline.py <cores> [scale]
Times: scan+salt+UDFs (noop), +windows (noop), full annotate+write.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from pii_redaction_data_pipeline_spark import get_spark
from pii_redaction_data_pipeline_spark.config import PipelineConfig
from pii_redaction_data_pipeline_spark.plans import pipeline as P
from pii_redaction_data_pipeline_spark.functions.langid import make_langid_udf
from pii_redaction_data_pipeline_spark.functions.perplexity import make_ppl_udf
from pii_redaction_data_pipeline_spark.functions.quality import (
    make_repetition_udf, n_words_col, symbol_ratio_col,
)
from pii_redaction_data_pipeline_spark.functions.scrub import make_scrub_udf
from pii_redaction_data_pipeline_spark.operators.skew import salted_repartition
from pii_redaction_data_pipeline_spark.operators.windows import with_conversation_flags
from pyspark.sql import functions as F

cores = int(sys.argv[1])
scale = sys.argv[2] if len(sys.argv) > 2 else "bench"
path = bench.ensure_transcripts(scale)
spark = get_spark(master=f"local[{cores}]", app_name="profile")
cfg = PipelineConfig()
src = spark.read.parquet(path)
print("input files:", len(src.inputFiles()), "rows:", src.count())

from pii_redaction_data_pipeline_spark.sources.tables import TableIO as _TIO
import shutil as _sh
_w = os.path.join(REPO, ".bench_cache", scale, f"prof_warm{cores}")
_sh.rmtree(_w, ignore_errors=True)
_TIO(spark, n_buckets=cfg.n_buckets).write_bucketed(P.annotate(src.limit(50000), cfg, spark), _w)
print("warmed")


def t(label, fn):
    t0 = time.time()
    fn()
    print(f"{label:30s} {time.time()-t0:7.2f}s")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


n_parts = spark.sparkContext.defaultParallelism * 2
text = F.col("text")

# phase A: scan + salted repartition only
t("A scan+salt", lambda: noop(salted_repartition(src, salt_buckets=cfg.salt_buckets, num_partitions=n_parts)))

# phase B: each UDF alone on salted input
base = salted_repartition(src, salt_buckets=cfg.salt_buckets, num_partitions=n_parts)
t("B1 langid", lambda: noop(base.withColumn("x", make_langid_udf()(text))))
t("B2 scrub", lambda: noop(base.withColumn("x", make_scrub_udf()(text))))
t("B3 ppl", lambda: noop(base.withColumn("x", make_ppl_udf(spark)(text))))
t("B4 repetition", lambda: noop(base.withColumn("x", make_repetition_udf()(text))))
t("B5 jvm heuristics", lambda: noop(
    base.withColumn("a", F.length(text)).withColumn("b", n_words_col(text))
    .withColumn("c", symbol_ratio_col(text))))

# phase C: the fused UDF (the real narrow stage)
def all_udfs():
    from pii_redaction_data_pipeline_spark.functions.fused import make_annotate_udf
    noop(base.withColumn("_ann", make_annotate_udf(spark)(text)))
t("C fused UDF", all_udfs)

# phase D: + windows
def with_windows():
    df = base.withColumn("rep", make_repetition_udf()(text))
    df = df.repartition(n_parts, "conv_id")
    df = with_conversation_flags(df, tool_loop_min_run=cfg.tool_loop_min_run)
    noop(df)
t("D rep+shuffle+windows", with_windows)

# phase E: full annotate -> noop
t("E annotate noop", lambda: noop(P.annotate(src, cfg, spark)))

# phase F: full annotate -> parquet write
out = os.path.join(REPO, ".bench_cache", scale, f"prof_out{cores}")
import shutil
shutil.rmtree(out, ignore_errors=True)
from pii_redaction_data_pipeline_spark.sources.tables import TableIO
io = TableIO(spark, n_buckets=cfg.n_buckets)
t("F annotate+write", lambda: io.write_bucketed(P.annotate(src, cfg, spark), out))
spark.stop()
