#!/usr/bin/env python3
"""Per-query optimization profiler (round 15, guide §1).

For each named declared query:
  * builds the plan and runs it into the noop sink (guide §1.4) —
    1 untimed warm-up + N timed runs, labeled via setJobDescription
    (guide §1.5);
  * captures ``explain("formatted")`` into ``plans/r15/<q>_<suffix>.txt``
    so plan-shape claims in OPTIMIZATION_r15.md are checkable offline.

Usage:
  python tools/opt_profile.py q1 q2 ... [--sf DIR] [--runs 3]
      [--suffix before|after] [--no-explain]

Prints one JSON line: {"queries": {name: {"min": s, "med": s,
"runs": [...]}}, "sf": dir}.
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

PLAN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r15")


def explain_str(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--suffix", default=None,
                    help="write plans/r15/<q>_<suffix>.txt when set")
    args = ap.parse_args()

    spark = get_spark("opt-profile", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()
    queries = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in args.names:
        fn = queries[name]
        sc = spark.sparkContext
        sc.setJobDescription(f"{name}: warmup")
        df = fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        if args.suffix:
            os.makedirs(PLAN_DIR, exist_ok=True)
            with open(os.path.join(PLAN_DIR, f"{name}_{args.suffix}.txt"),
                      "w") as fh:
                fh.write(explain_str(df))
        runs = []
        for i in range(args.runs):
            sc.setJobDescription(f"{name}: timed {i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        srt = sorted(runs)
        out[name] = {"min": srt[0], "med": srt[len(srt) // 2], "runs": runs}
        sys.stderr.write(f"{name}: min {srt[0]} med {srt[len(srt)//2]}\n")
    print(json.dumps({"queries": out, "sf": args.sf}))


if __name__ == "__main__":
    main()
