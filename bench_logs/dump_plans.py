"""Dump .explain('formatted') for named queries — plans/r07 evidence."""
import sys, os
repo, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, repo)
from portuguese_pt_legal_ner_spark.session import build_session
import __spark_entry__ as em
spark = build_session(app_name="plandump", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(outdir, exist_ok=True)
qs = em.queries()
for name in names:
    try:
        spark.catalog.clearCache()
        df = qs[name](spark, "/root/testdata/sf0.1")
        df.count()  # execute so AQE shows the final plan
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"{outdir}/{name}_{suffix}.txt", "w") as f:
            f.write(txt)
        print("dumped", name, flush=True)
    except Exception as e:
        print("FAIL", name, str(e)[:200], flush=True)
# streaming stateful plans: explain of the unstarted stream DF
from portuguese_pt_legal_ner_spark.streaming.neardup import (
    neardup_pairs_stream, DOCS_STREAM_SCHEMA)
from pyspark.sql import functions as F
import tempfile
inp = tempfile.mkdtemp(prefix="pd_in_")
(spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
 .filter(F.col("text").isNotNull())
 .select("doc_id", (F.lit(1704067200)+F.col("doc_id")).cast("timestamp").alias("ts"), "text")
 .write.mode("overwrite").parquet(inp))
stream = (spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(inp).withWatermark("ts", "365 days"))
sdf = neardup_pairs_stream(stream, 3, 4, 365*86400, 1_000_000)
txt = sdf._sc._jvm.PythonSQLUtils.explainString(sdf._jdf.queryExecution(), "formatted")
with open(f"{outdir}/stream_neardup_pairs_{suffix}.txt", "w") as f:
    f.write(txt)
print("dumped stream_neardup_pairs (stateful logical)", flush=True)
spark.stop()
