#!/usr/bin/env python3
"""Run bench.py and write a SELF-CONTAINED bench artifact (VERDICT r11
#9): the harness records only a bounded stdout tail, which truncates the
one-line JSON (BENCH_r11.json carried "parsed": null and lost
total_sec).  This runner captures the full line and writes the same
artifact shape with "parsed" populated, so the committed BENCH_r{N}.json
is readable without reconstructing the line from its tail.

Round 15 (VERDICT r14 #7) adds the codified host-factor protocol from
BENCH_DIAGNOSIS_r14's "Rule for round 15": session hosts vary ±20-30 %,
so raw cross-round seconds mislead.  With ``--host-factor REF
--prior-artifact PATH`` the runner first checks the PRIOR round's
committed tree out into a throwaway git worktree, runs ITS bench.py
under the same env, and ratios the common query rows against the prior
round's RECORDED artifact — the median ratio is this session's
host_factor (>1 = this host is slower than the one that recorded the
prior artifact), stamped into the output so diagnoses cite a measured
number instead of re-deriving it.

Usage:
  python tools/record_bench.py BENCH_r15.json [--sf DIR] [--cpus N]
      [--host-factor GIT_REF --prior-artifact tools/bench_r14_run_h.json]
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(bench_dir: Path, env: dict) -> tuple[int, dict | None, str]:
    proc = subprocess.run(
        [sys.executable, str(bench_dir / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(bench_dir))
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    parsed = None
    try:
        parsed = json.loads(line)
    except (ValueError, IndexError):
        pass
    return proc.returncode, parsed, (line if parsed else proc.stderr[-3000:])


def _host_factor(ref: str, prior_artifact: Path, env: dict) -> dict:
    """Check out ``ref`` in a temp worktree, run its bench, ratio the
    common rows against the artifact that round RECORDED."""
    recorded = json.loads(prior_artifact.read_text())
    prior_q = (recorded.get("parsed") or {}).get("queries")
    if not prior_q:
        raise SystemExit(
            f"{prior_artifact} has no parsed.queries to ratio against")
    with tempfile.TemporaryDirectory() as td:
        wt = Path(td) / "prior"
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(wt), ref],
            cwd=str(REPO), check=True, capture_output=True)
        try:
            rc, parsed, tail = _run_bench(wt, env)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", str(wt)],
                cwd=str(REPO), capture_output=True)
    if rc or not parsed:
        raise SystemExit(
            f"prior-tree bench failed (rc={rc}): {tail[:2000]}")
    now_q = parsed["queries"]
    common = sorted(set(prior_q) & set(now_q))
    ratios = sorted(now_q[k] / prior_q[k] for k in common if prior_q[k] > 0)
    if not ratios:
        raise SystemExit("no common query rows to ratio")
    return {
        "host_factor": round(ratios[len(ratios) // 2], 3),
        "rows": len(ratios),
        "prior_ref": ref,
        "prior_artifact": str(prior_artifact.relative_to(REPO)
                              if prior_artifact.is_relative_to(REPO)
                              else prior_artifact),
        "prior_rerun_total": parsed["value"],
        "prior_recorded_total": recorded["parsed"].get("value"),
        # the rerun's per-query minima, so diagnoses can ratio
        # row-by-row without re-running the prior tree
        "prior_rerun_queries": now_q,
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = REPO / (args[0] if args else "BENCH_local.json")
    env = dict(os.environ)
    for flag, var in (("--sf", "SPARK_GRAFT_SF_DIR"),
                      ("--cpus", "SPARK_GRAFT_CPUS")):
        if flag in sys.argv:
            env[var] = sys.argv[sys.argv.index(flag) + 1]
    host = None
    if "--host-factor" in sys.argv:
        ref = sys.argv[sys.argv.index("--host-factor") + 1]
        if "--prior-artifact" not in sys.argv:
            raise SystemExit("--host-factor needs --prior-artifact PATH")
        prior = REPO / sys.argv[sys.argv.index("--prior-artifact") + 1]
        host = _host_factor(ref, prior, env)
    rc, parsed, line = _run_bench(REPO, env)
    m = re.search(r"_r(\d+)", out_path.name)
    artifact = {
        "n": int(m.group(1)) if m else 1,
        "rc": rc,
        "cpus": env.get("SPARK_GRAFT_CPUS", ""),
        "sf": env.get("SPARK_GRAFT_SF_DIR", ""),
        "tail": line,                # the FULL line, not a bounded tail
        "parsed": parsed,
    }
    if host is not None:
        artifact["host"] = host
    out_path.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"wrote {out_path} rc={rc} "
          f"parsed={'yes' if parsed else 'NO'}"
          + (f" host_factor={host['host_factor']}" if host else ""))
    if rc or parsed is None:
        sys.stderr.write(line)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
