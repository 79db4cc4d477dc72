"""Diagnose which stage of the messages job fails to scale: run the job at
local[N] with (a) the real parquet sink, (b) a noop sink (parse+enrich+sort
only), (c) parse-only (noop, no enrich/sort), printing per-variant secs.

Usage: SPARK_GRAFT_CPUS=N python tools/scale_diag.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from pyspark.sql import functions as F


def main() -> None:
    from clp_spark.plans import pipeline as P
    from clp_spark.session import get_spark
    from clp_spark.sources.transcripts import dim_role, dim_tool, load_transcripts

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    repl = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", "120"))
    t = load_transcripts(spark, bench.SF_DIR)
    t = (
        t.withColumn("rep", F.explode(F.expr(f"sequence(0, {repl - 1})")))
        .withColumn("conv_id", F.concat_ws("-", "conv_id", "rep"))
        .drop("rep")
    )
    t = t.repartition(spark.sparkContext.defaultParallelism).cache()
    n = t.count()

    dr, dt = dim_role(spark), dim_tool(spark)
    base = bench._bench_tmpdir()

    def cache_only():
        t.write.format("noop").mode("overwrite").save()

    def parse_only():
        P.parse_encode_ids(t).write.format("noop").mode("overwrite").save()

    def full_noop():
        parsed = P.parse_encode_ids(t)
        enriched = P.enrich(parsed, dr, dt)
        msgs = enriched.withColumn(
            "logtype_bucket", F.pmod(F.col("logtype_id"), F.lit(16)).cast("int")
        ).select("conv_id", "turn_idx", "ts", "role", "tool", "logtype_id",
                 "encoded_vars", "logtype_bucket")
        msgs.sortWithinPartitions("logtype_bucket").write.format("noop").mode(
            "overwrite"
        ).save()

    k = [0]

    def full_parquet():
        k[0] += 1
        parsed = P.parse_encode_ids(t)
        enriched = P.enrich(parsed, dr, dt)
        msgs = enriched.withColumn(
            "logtype_bucket", F.pmod(F.col("logtype_id"), F.lit(16)).cast("int")
        ).select("conv_id", "turn_idx", "ts", "role", "tool", "logtype_id",
                 "encoded_vars", "logtype_bucket")
        msgs.sortWithinPartitions("logtype_bucket").write.mode("overwrite").partitionBy(
            "logtype_bucket"
        ).parquet(f"{base}/t{k[0]}")

    out = {"cpus": bench.CPUS, "turns": n}
    for name, fn in [
        ("cache_only", cache_only),
        ("parse_only", parse_only),
        ("full_noop", full_noop),
        ("full_parquet", full_parquet),
    ]:
        fn()  # warm
        secs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            secs.append(round(time.perf_counter() - t0, 2))
        out[name] = secs
    import json as _json
    import shutil as _sh

    _sh.rmtree(base, ignore_errors=True)
    print("DIAG:" + _json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
