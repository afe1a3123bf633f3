#!/usr/bin/env python3
"""Per-query job/stage accounting (round 15, guide §1/§7).

For each named declared query, runs it once into the noop sink and
reports: wall seconds, number of Spark JOBS the single bench action
actually launched (extra jobs = driver-synchronous round trips inside
the operator: collects, eager checkpoints, convergence probes), number
of stages, and the Exchange count in the final plan.  High job counts on
small inputs flag driver-latency-bound operators (guide §7.3).

Usage: python tools/opt_jobs.py q1 q2 ... [--sf DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from hive2es_offline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    spark = get_spark("opt-jobs", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()
    queries = entry_mod.queries()
    tracker = spark.sparkContext.statusTracker()
    out: dict[str, dict] = {}
    for name in args.names:
        fn = queries[name]
        # warm-up (untimed; also primes file listings)
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        before = set(tracker.getJobIdsForGroup() or [])
        jvm_sc = spark.sparkContext._jsc.sc()
        jobs0 = jvm_sc.dagScheduler().nextJobId()
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jobs1 = jvm_sc.dagScheduler().nextJobId()
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = {
            "wall": round(wall, 3),
            "build": round(t_build, 3),
            "jobs": jobs1 - jobs0,
            "exchanges": plan.count("Exchange"),
        }
        sys.stderr.write(f"{name}: wall {wall:.3f} build {t_build:.3f} "
                         f"jobs {jobs1 - jobs0} exch {plan.count('Exchange')}\n")
    print(json.dumps({"queries": out, "sf": args.sf}))


if __name__ == "__main__":
    main()
