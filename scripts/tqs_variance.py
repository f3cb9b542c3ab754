"""Variance-band `text_quality_stats` (r10 verdict, Next round #2): its
warm number moved 0.415 -> 0.643 s across r9 -> r10 with `text.py`
untouched all round, and history oscillates (r3 warm 0.667 -> r9 0.415 ->
r10 0.643).  Same method as the ingest-throughput band (SCALE.md
Round-10): N trials at IDENTICAL code, each trial a FRESH
interpreter+JVM via subprocess so nothing leaks between trials, bench's
exact measurement protocol per trial (per-table limit(1) warmup, cold =
first execution, warm = median of 3 re-executions), loadavg recorded at
each trial entry.  The resulting band goes in SCALE.md with a re-check
trigger; a warm number INSIDE the band is box/JVM phase luck and must
not be bisected.

Usage:  python scripts/tqs_variance.py [n_trials]   (default 7)
        python scripts/tqs_variance.py --child      (internal)
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


def child() -> None:
    from bulkfhirloader_spark.queries.registry import text_quality_stats
    from bulkfhirloader_spark.session import get_spark
    from bulkfhirloader_spark.sources.tables import load_table

    tm = time.monotonic
    spark = get_spark(app_name="tqs-variance")
    # bench-identical warmup for this query's input: footer read + first
    # scan outside the timing
    load_table(spark, SF_DIR, "documents").limit(1).collect()
    t0 = tm()
    text_quality_stats(spark, SF_DIR).collect()
    cold = round(tm() - t0, 3)
    reps = []
    for _ in range(3):
        t0 = tm()
        text_quality_stats(spark, SF_DIR).collect()
        reps.append(tm() - t0)
    warm = round(sorted(reps)[1], 3)
    print(json.dumps({"cold": cold, "warm": warm,
                      "warm_reps": [round(r, 3) for r in reps]}))
    spark.stop()


def main(n_trials: int) -> None:
    trials = []
    for i in range(n_trials):
        try:
            load = tuple(round(x, 2) for x in os.getloadavg())
        except OSError:
            load = (-1.0, -1.0, -1.0)
        # quiesce between trials: each child leaves a dying JVM behind
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            try:
                l1, l5, _ = os.getloadavg()
                if max(l1, 0.5 * l5) <= 2.0:
                    break
            except OSError:
                break
            time.sleep(5.0)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True, text=True, cwd=REPO, timeout=600,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            rec = {"error": out.stderr[-300:]}
        rec["trial"] = i
        rec["loadavg_at_entry"] = load
        trials.append(rec)
        print(json.dumps(rec), flush=True)
    colds = sorted(t["cold"] for t in trials if "cold" in t)
    warms = sorted(t["warm"] for t in trials if "warm" in t)
    summary = {
        "query": "text_quality_stats",
        "sf_dir": SF_DIR,
        "n_trials": n_trials,
        "cold_band": [colds[0], colds[-1]] if colds else None,
        "warm_band": [warms[0], warms[-1]] if warms else None,
        "cold_median": colds[len(colds) // 2] if colds else None,
        "warm_median": warms[len(warms) // 2] if warms else None,
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 7)
