#!/usr/bin/env python3
"""Isolated-session drift probe for bench movers (VERDICT r6 #8).

Bench numbers come from one long-lived JVM running ~34 queries back to
back; a query can move >30% round-over-round purely from neighborhood
effects (GC pressure, page cache, JIT state — see BENCH_DIAGNOSIS_r06 §1,
where an apparent 64% jsonl_export regression measured at steady state
inside target).  This tool re-measures each mover the way that diagnosis
did: ONE FRESH Spark session per query (own subprocess, own JVM), bench's
exact methodology (1 untimed warm-up + N timed runs into the noop sink,
min + median reported), so a real regression separates from suite noise.

Usage:
    python tools/probe_drift.py BENCH_r06.json BENCH_r07.json \
        [--threshold 0.15] [--out PROBE_r08.json]
    python tools/probe_drift.py --one <query>      # internal per-query run
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _bench_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed", doc)  # driver wraps bench output under "parsed"
    return parsed["queries"]


def probe_one(name: str, runs: int = 5) -> None:
    """Measure one query in THIS process's fresh session; print one JSON
    line.  Called in a subprocess so every probe gets a cold JVM."""
    from hive2es_offline_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        "drift-probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = entry_mod.queries()[name]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(q(spark, SF_DIR))  # untimed warm-up (codegen compile + JIT)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        noop(q(spark, SF_DIR))
        times.append(time.perf_counter() - t0)
    times.sort()
    print(json.dumps({
        "query": name,
        "isolated_min": round(times[0], 3),
        "isolated_median": round(times[len(times) // 2], 3),
    }))
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("benches", nargs="*", help="two BENCH_r*.json files (prev, cur)")
    p.add_argument("--threshold", type=float, default=0.15)
    p.add_argument("--out", default=None)
    p.add_argument("--one", default=None, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.one:
        probe_one(args.one)
        return
    if len(args.benches) != 2:
        p.error("need two bench files (or --one <query>)")

    prev, cur = (_bench_queries(b) for b in args.benches)
    movers = {}
    for name in sorted(set(prev) & set(cur)):
        if prev[name] <= 0:
            continue
        delta = (cur[name] - prev[name]) / prev[name]
        if abs(delta) > args.threshold:
            movers[name] = {"prev": prev[name], "cur": cur[name],
                            "delta_pct": round(100 * delta, 1)}
    report = {"threshold_pct": round(100 * args.threshold, 1),
              "sf_dir": SF_DIR, "movers": movers}
    for name, info in movers.items():
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True, cwd=REPO, timeout=600,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        try:
            info.update(json.loads(line))
        except json.JSONDecodeError:
            info["error"] = out.stderr[-500:]
        # the verdict each probe exists to give: does the movement
        # reproduce in steady state, or was it suite neighborhood noise?
        if "isolated_min" in info:
            iso = info["isolated_min"]
            info["verdict"] = (
                "real" if abs(iso - info["prev"]) / info["prev"] > args.threshold
                else "suite-noise"
            )
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
