"""Per-query isolation harness (guide §1.4) — NOT the driver bench.

Runs selected headline queries in isolation with the noop sink,
N repetitions, optional .explain("formatted") capture. bench.py stays
frozen (driver contract); all round-7 optimization evidence cites this
file plus bench.py runs.

Usage:
  python bench_extra.py q1 q2 ...          # time queries (3 reps)
  python bench_extra.py --explain q ...    # also dump plans to stdout
  env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SG_REPS, SG_SINK=noop|count
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SG_REPS", "3"))
SINK = os.environ.get("SG_SINK", "count")


def main() -> None:
    import __spark_entry__ as entrymod
    from portuguese_pt_legal_ner_spark.session import build_session

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv

    spark = build_session(
        app_name="pt-legal-ner-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out: dict[str, list[float]] = {}
    for name in args:
        fn = qs[name]
        if explain:
            spark.catalog.clearCache()
            df = fn(spark, SF_DIR)
            print(f"===== PLAN {name} =====")
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
        times = []
        for rep in range(REPS):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if SINK == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()  # the frozen bench's materialization
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(json.dumps({"query": name, "times": times,
                          "median": sorted(times)[len(times) // 2]}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
