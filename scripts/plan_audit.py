"""Plan audit: tabulate the physical-plan cost markers of every registered
query into PLANS.md — the institutionalized form of ".explain() and iterate".

For each query: Exchange count (shuffles — the scale currency), Sort count,
join strategies, Python boundaries (BatchEvalPython = row-wise UDF, always a
bug here; ArrowEvalPython/MapInPandas = the sanctioned Arrow paths), and
scan pushdown evidence.  Streaming queries are skipped (they execute on
invocation); plan-lint thresholds live in tests/test_plans.py — this script
is the human-readable census.

Usage: python scripts/plan_audit.py [sf_dir]  (default sf0.001; writes PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Streaming queries EXECUTE on invocation (they run a writeStream to a
# memory sink before returning), so auditing them here would both run the
# workload and print the post-hoc batch plan of the sink table — pytest
# audits their stateful plans instead.  Prefix match so new stream_*
# registrations can't silently leak in.
SKIP_PREFIXES = ("stream_",)
SKIP = {"ref_ingest_streaming"}

MARKERS = {
    "exchanges": r"Exchange ",
    "sorts": r"\bSort \[",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "window": r"\bWindow \[",
    "py_row": r"BatchEvalPython",
    "arrow": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
}

# GLOBAL (partition-less) window detection: a windowspecdefinition whose
# every argument before specifiedwindowframe is an ORDER spec (ends with
# ASC/DESC NULLS FIRST/LAST) or absent — these are the WindowExec "No
# Partition Defined" sites, serialized single-partition sorts at corpus
# size.  Every one must run on a BOUNDED intermediate and be allow-listed
# below with that bound stated (r15, r14 verdict #5; tests/test_plans.py
# asserts the census equals the allowlist).  Parsed with a depth-aware
# top-level-comma split, NOT a regex: an order key that prints as an
# expression (``CAST(x#3 AS INT) ASC NULLS FIRST``, ``coalesce(a#1,
# b#2) DESC NULLS LAST``) contains parens/commas a regex alternative
# would misread, silently excluding a real global window from the census.
_ORDER_SUFFIX = re.compile(r"(ASC|DESC) NULLS (FIRST|LAST)$")


def _spec_args(line: str, start: int) -> list[str]:
    """Top-level comma-split arguments of the windowspecdefinition call
    opening at ``start`` (index of its '(')."""
    args, depth, buf = [], 0, []
    for ch in line[start:]:
        if ch == "(":
            depth += 1
            if depth == 1:
                continue
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args.append("".join(buf).strip())
                return args
        elif ch == "," and depth == 1:
            args.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    return args  # unbalanced line (truncated print): best effort


def has_global_window(line: str) -> bool:
    """True iff a Window operator line contains a windowspecdefinition
    with NO partition columns — every argument before the
    specifiedwindowframe is an order spec."""
    if "Window [" not in line:
        return False
    for m in re.finditer(r"windowspecdefinition\(", line):
        args = _spec_args(line, m.end() - 1)
        before_frame = [
            a for a in args if not a.startswith("specifiedwindowframe")
        ]
        if all(_ORDER_SUFFIX.search(a) for a in before_frame):
            return True
    return False

# query -> the bounded intermediate its global window runs on
GLOBAL_WINDOW_ALLOWLIST = {
    "cur_pack_token_shards": (
        "prefix sum over the per-bucket token totals table — bounded by "
        "max_offset_rows (default 64k; bucket width derived from the id "
        "span, bound unit-tested in test_curation.py)"
    ),
    "cur_full_pipeline": (
        "same packing prefix sum, composed (pack_token_shards stage)"
    ),
    "cur_temperature_sample": (
        "global min over the per-group count table — one row per "
        "quality/domain group, bounded by the grouping cardinality"
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from bulkfhirloader_spark.queries.registry import REGISTRY
    from bulkfhirloader_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", shuffle_partitions=4)
    rows = []
    for name in sorted(REGISTRY):
        if name in SKIP or name.startswith(SKIP_PREFIXES):
            continue
        fn, _sql = REGISTRY[name]
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            rows.append((name, None, f"ERR {type(exc).__name__}"))
            continue
        counts = {k: len(re.findall(p, plan)) for k, p in MARKERS.items()}
        counts["gwin"] = sum(
            1 for ln in plan.splitlines() if has_global_window(ln)
        )
        rows.append((name, counts, None))

    out = [
        "# PLANS — physical-plan census (generated by scripts/plan_audit.py)",
        "",
        f"One row per registered batch query at `{sf_dir}`.  Columns: shuffle",
        "Exchanges, Sorts, join strategies (BHJ broadcast-hash / SMJ sort-merge /",
        "BNLJ broadcast-nested-loop — BNLJ rows are all 1-row scalar broadcasts,",
        "allow-listed in tests/test_plans.py), Window operators, and Python",
        "boundaries (row-wise is banned by test; Arrow = sanctioned mapInPandas).",
        "Streaming queries execute on invocation and are audited in",
        "tests/test_streaming.py instead.",
        "",
        "Reading caveats: (1) a LAZY localCheckpoint's subplan prints once",
        "per reference but executes ONCE (same RDD id; stages share the",
        "materialized blocks) — the `dedup_*_verified`-family counts",
        "overstate runtime shuffles for this reason; (2) a query whose",
        "heavy phases run at CONSTRUCTION time behind eager checkpoints or",
        "a size-gated driver tier (dedup_incremental_admission) shows only",
        "its final consume plan here — its construction-time plan shape is",
        "asserted in tests/test_plans.py instead.",
        "",
        "| query | Exch | Sort | BHJ | SMJ | BNLJ | Win | GWin | py-row | arrow |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, c, err in rows:
        if err:
            out.append(f"| `{name}` | {err} | | | | | | | | |")
        else:
            out.append(
                f"| `{name}` | {c['exchanges']} | {c['sorts']} | {c['bhj']} | "
                f"{c['smj']} | {c['bnlj']} | {c['window']} | {c['gwin']} | "
                f"{c['py_row']} | {c['arrow']} |"
            )
    audited = [c for _, c, _e in rows if c]
    gwin_hits = sorted(
        name for name, c, _e in rows if c and c["gwin"]
    )
    out.append("")
    out.append(
        f"{len(audited)} queries audited; "
        f"{sum(1 for c in audited if c['py_row'])} with row-wise Python "
        f"(must be 0); max Exchanges: {max(c['exchanges'] for c in audited)}."
    )
    out.append("")
    out.append("## Global-window allowlist (r15, r14 verdict #5)")
    out.append("")
    out.append(
        "GWin counts partition-less Window operators (WindowExec's `No"
        " Partition Defined` warning sites — a single-partition sort if fed"
        " corpus-sized input).  Every occurrence below runs on a BOUNDED"
        " intermediate, stated per query; tests/test_plans.py asserts this"
        " census equals the allowlist, so an unexplained global window"
        " fails CI rather than hiding in bench-log warning noise."
    )
    out.append("")
    unexplained = [n for n in gwin_hits if n not in GLOBAL_WINDOW_ALLOWLIST]
    for n in gwin_hits:
        bound = GLOBAL_WINDOW_ALLOWLIST.get(n, "UNEXPLAINED — fix or allow-list")
        out.append(f"- `{n}`: {bound}")
    for n in sorted(GLOBAL_WINDOW_ALLOWLIST):
        if n not in gwin_hits:
            out.append(
                f"- `{n}`: allow-listed but NOT observed this run — prune?"
            )
    out.append("")
    out.append(
        f"{len(gwin_hits)} queries with global windows; "
        f"{len(unexplained)} unexplained (must be 0)."
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"{len(audited)} queries audited -> PLANS.md")


if __name__ == "__main__":
    main()
