#!/usr/bin/env python3
"""Run bench.py and write a SELF-CONTAINED bench artifact (VERDICT r11
#9): the harness records only a bounded stdout tail, which truncates the
one-line JSON (BENCH_r11.json carried "parsed": null and lost
total_sec).  This runner captures the full line and writes the same
artifact shape with "parsed" populated, so the committed BENCH_r{N}.json
is readable without reconstructing the line from its tail.

Usage: python tools/record_bench.py BENCH_r12.json [--sf DIR] [--cpus N]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = REPO / (args[0] if args else "BENCH_local.json")
    env = dict(os.environ)
    for flag, var in (("--sf", "SPARK_GRAFT_SF_DIR"),
                      ("--cpus", "SPARK_GRAFT_CPUS")):
        if flag in sys.argv:
            env[var] = sys.argv[sys.argv.index(flag) + 1]
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(REPO))
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    parsed = None
    try:
        parsed = json.loads(line)
    except (ValueError, IndexError):
        pass
    artifact = {
        "n": 1,
        "rc": proc.returncode,
        "cpus": env.get("SPARK_GRAFT_CPUS", ""),
        "sf": env.get("SPARK_GRAFT_SF_DIR", ""),
        "tail": line,                # the FULL line, not a bounded tail
        "parsed": parsed,
    }
    out_path.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"wrote {out_path} rc={proc.returncode} "
          f"parsed={'yes' if parsed else 'NO'}")
    if proc.returncode or parsed is None:
        sys.stderr.write(proc.stderr[-3000:])
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
