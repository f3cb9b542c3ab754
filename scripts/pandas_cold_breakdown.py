"""Root-cause the sim_topk_pandas COLD oscillation (r9 verdict, Next
round #4): the bench cold number wandered 2.13 -> 1.73 -> 2.35 s across
rounds 7-9 while warm held ~0.35 s, so ~2 s of the cold figure is
something other than the query's plan.  This script decomposes it.

Hypothesis: cold = (a) Python/Arrow worker-pool spawn + Arrow module
import inside the workers, (b) JVM whole-stage codegen + broadcast of the
query matrix, (c) the actual dgemm scoring (the warm number).  (a) is
per-SparkContext one-time cost and lands on whichever query triggers the
FIRST Arrow exchange in a session — in bench.py's alphabetical-ish
headline order that is sim_topk_pandas, which is why ITS cold row
oscillates while its plan is innocent.

Protocol (each trial a FRESH interpreter+JVM via subprocess, so nothing
leaks between trials):
  mode=direct  — time sim_topk_pandas cold, then warm.
  mode=prespawn — first run a TRIVIAL mapInPandas over a 1-row in-memory
    DataFrame (spawns the Python worker pool + imports pyarrow/pandas in
    the workers; shares no plan, no data, no broadcast with the query),
    timed as `spawn`; THEN time the same cold+warm query.
The direct-cold minus prespawn-cold gap is the worker-spawn share; what
remains above warm is JVM codegen + broadcast ship.

Usage:  python scripts/pandas_cold_breakdown.py [n_trials]   (default 3)
        python scripts/pandas_cold_breakdown.py --child <mode>  (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def child(mode: str) -> None:
    from bulkfhirloader_spark.queries.registry import sim_topk_pandas
    from bulkfhirloader_spark.session import get_spark

    tm = time.monotonic
    out: dict = {"mode": mode}
    t0 = tm()
    spark = get_spark(app_name=f"pandas-cold-{mode}")
    out["session"] = round(tm() - t0, 3)
    if mode == "prespawn":
        # trivial Arrow exchange: 1 in-memory row, no file scan, no
        # broadcast — isolates worker-pool spawn + worker-side imports
        def _ident(it):
            for pdf in it:
                yield pdf

        t0 = tm()
        spark.createDataFrame([(1,)], "x long").mapInPandas(
            _ident, "x long"
        ).collect()
        out["spawn"] = round(tm() - t0, 3)
    t0 = tm()
    sim_topk_pandas(spark, SF_DIR).collect()
    out["cold"] = round(tm() - t0, 3)
    t0 = tm()
    sim_topk_pandas(spark, SF_DIR).collect()
    out["warm"] = round(tm() - t0, 3)
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = []
    for trial in range(n):
        for mode in ("direct", "prespawn"):
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", mode],
                capture_output=True, text=True, timeout=600,
            )
            line = next(
                (l for l in res.stdout.splitlines() if l.startswith("RESULT ")),
                None,
            )
            if line is None:
                print(res.stdout[-2000:], res.stderr[-2000:])
                raise SystemExit(f"child {mode} produced no RESULT")
            rec = json.loads(line[len("RESULT "):])
            rec["trial"] = trial
            rows.append(rec)
            print(rec, flush=True)
    direct = [r["cold"] for r in rows if r["mode"] == "direct"]
    pre = [r["cold"] for r in rows if r["mode"] == "prespawn"]
    spawn = [r["spawn"] for r in rows if r["mode"] == "prespawn"]
    warm = [r["warm"] for r in rows]
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        f"\nmedians: direct_cold={med(direct):.2f}s prespawn_cold={med(pre):.2f}s "
        f"spawn_job={med(spawn):.2f}s warm={med(warm):.2f}s\n"
        f"worker-spawn share of cold = {med(direct) - med(pre):.2f}s; "
        f"plan-side cold overhead (codegen+broadcast) = {med(pre) - med(warm):.2f}s"
    )


if __name__ == "__main__":
    if sys.argv[1:2] == ["--child"]:
        child(sys.argv[2])
    else:
        main()
