#!/usr/bin/env python
"""Benchmark harness for the clp_spark engine (driver contract).

Default mode: on local[$SPARK_GRAFT_CPUS] against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1):
  1. times the headline queries (per-query seconds),
  2. measures end-to-end ingest throughput (parse -> encode -> enrich ->
     route, forced via a noop write so nothing is skipped lazily),
  3. runs the same ingest job in two fresh subprocesses at local[8] and
     local[32] on the SAME input and reports throughput at both plus scaling
     efficiency = (tp32/tp8)/4 — the sandbox proxy for the N-vs-4N-executor
     criterion in BASELINE.json (no real cluster here).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "ingest": {"turns": n, "sec": s, "turns_per_sec": tp},
   "scaling": {"cpus_lo": 8, "tp_lo": ..., "cpus_hi": 32, "tp_hi": ...,
               "efficiency": e}}

`--scale-probe` (internal): run ONLY the ingest job and print its JSON; the
parent sets SPARK_GRAFT_CPUS so each probe gets its own JVM + master — the
only way to vary local[N] parallelism honestly.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Replicate the transcript corpus for the scaling probe so the parallel
# region dominates fixed costs (100k turns x REPL).
SCALE_REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", "8"))

HEADLINE = [
    "logtype_counts",
    "tool_counts",
    "conversation_counts",
    "count_by_time",
    "search_substring",
    "search_wildcard",
    "kql_filter",
    "roundtrip_mismatches",
    "q1_lineitem",
    "nation_order_counts",
    "dedup_exact_docs",
    "minhash_lsh_dups",
    "token_counts",
    "ann_topk",
]


def _force(df):
    """Fully materialize a DataFrame without sink I/O cost."""
    df.write.format("noop").mode("overwrite").save()


def run_ingest(spark, sf_dir: str, replicate: int = 1, trials: int = 3) -> dict:
    """The north-star job: parse -> encode -> enrich -> route, end to end.

    One untimed warmup run amortizes Python-worker spawn + codegen JIT (at
    100 TB those are noise; measuring them would just benchmark fork()),
    then the best of `trials` timed runs is reported as steady-state
    throughput.
    """
    from pyspark.sql import functions as F

    from clp_spark.plans import pipeline as P
    from clp_spark.sources.transcripts import dim_role, dim_tool, load_transcripts

    t = load_transcripts(spark, sf_dir)
    if replicate > 1:
        t = (
            t.withColumn("rep", F.explode(F.expr(f"sequence(0, {replicate - 1})")))
            .withColumn("conv_id", F.concat_ws("-", "conv_id", "rep"))
            .drop("rep")
        )
    t = t.repartition(spark.sparkContext.defaultParallelism).cache()
    n_turns = t.count()  # warm the input cache: measure the pipeline, not the parquet scan

    def job():
        parsed = P.parse_encode(t)
        enriched = P.enrich(parsed, dim_role(spark), dim_tool(spark))
        routed = P.route(enriched)
        _force(P.encoded_messages(routed.drop("logtype_bucket", "salt")))

    job()  # warmup (untimed)
    secs = []
    for _ in range(trials):
        t0 = time.perf_counter()
        job()
        secs.append(time.perf_counter() - t0)
    sec = min(secs)
    t.unpersist()
    return {"turns": n_turns, "sec": round(sec, 3), "turns_per_sec": round(n_turns / sec, 1)}


def scale_probe() -> None:
    from clp_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    res = run_ingest(spark, SF_DIR, replicate=SCALE_REPLICATE)
    res["cpus"] = CPUS
    print("PROBE_JSON:" + json.dumps(res))
    spark.stop()


def run_scaling() -> dict | None:
    out = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scale-probe"],
                env=env, capture_output=True, text=True, timeout=1200,
            )
            line = next(
                ln for ln in proc.stdout.splitlines() if ln.startswith("PROBE_JSON:")
            )
            out[cpus] = json.loads(line[len("PROBE_JSON:"):])
        except Exception as ex:  # scaling evidence is best-effort in bench
            print(f"scaling probe local[{cpus}] failed: {ex}", file=sys.stderr)
            return None
    tp_lo, tp_hi = out[8]["turns_per_sec"], out[32]["turns_per_sec"]
    return {
        "cpus_lo": 8, "tp_lo": tp_lo, "sec_lo": out[8]["sec"],
        "cpus_hi": 32, "tp_hi": tp_hi, "sec_hi": out[32]["sec"],
        "turns": out[8]["turns"],
        "efficiency": round((tp_hi / tp_lo) / 4, 3),
    }


def main() -> None:
    import __spark_entry__ as E
    from clp_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    timings = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(qs[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    ingest = run_ingest(spark, SF_DIR)
    spark.stop()

    scaling = None if os.environ.get("SPARK_GRAFT_SKIP_SCALING") else run_scaling()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline query suite wall time (clp_spark, local[%d])" % CPUS,
        "value": round(sum(timings.values()) + ingest["sec"], 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "ingest": ingest,
    }
    if scaling:
        result["scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    if "--scale-probe" in sys.argv:
        scale_probe()
    else:
        main()
