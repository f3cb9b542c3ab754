"""Regenerate QUERIES.md — the one-line-per-query catalog of the driver
registry, grouped by surface.  Run after adding registry entries:

    python scripts/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulkfhirloader_spark.queries.registry import REGISTRY  # noqa: E402

GROUPS = [
    ("Reference parity — statistics pipelines (SURVEY §2.5/§2.3)", "ref_a", "ref_p"),
    ("Reference parity — joins, scalars, sinks (SURVEY §2.4/§2.7/§2.2)", "ref_j", "ref_f", "ref_k", "ref_pop"),
    ("Reference parity — ingest pipeline end-to-end (SURVEY §3.2)", "ref_ingest"),
    ("TPC-H query shapes (all 22, adapted where testdata lacks columns)", "q"),
    ("Extension — relational surface beyond the reference", "ext_"),
    ("Extension — deduplication", "dedup_"),
    ("Extension — text analysis & PII", "text_"),
    ("Extension — similarity search & embeddings", "sim_", "emb_"),
    ("Extension — event-time windows & events", "win_", "events_"),
    ("Extension — corpus curation", "cur_"),
    ("Extension — corpus sources (JSONL interchange)", "src_"),
    ("Extension — multimodal columns", "mm_"),
    ("Extension — structured streaming", "stream_"),
]


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return ""
    line = " ".join(doc.split("\n\n")[0].split())
    return line


def main() -> None:
    assigned: set[str] = set()
    out = [
        "# QUERIES — driver-checked registry catalog",
        "",
        "One row per `queries()` entry in `bulkfhirloader_spark/queries/registry.py`.",
        "**oracle** = the driver hash-compares the Spark result against the paired",
        "DuckDB SQL at sf0.01; *rows-only* entries are probabilistic/stateful ops",
        "whose exact output is engine-specific (their semantics are pytest-checked).",
        "Regenerate with `python scripts/gen_queries_md.py`.",
        "",
    ]
    n_oracle = sum(1 for _fn, sql in REGISTRY.values() if sql is not None)
    out.append(f"**{len(REGISTRY)} queries, {n_oracle} oracle-checked, "
               f"{len(REGISTRY) - n_oracle} rows-only.**")
    out.append("")
    for title, *prefixes in GROUPS:
        # sorted, not REGISTRY order: the registry dict is reordered every
        # round by the disclosed driver-window rotation, and following it
        # would churn this catalog cosmetically round-over-round
        names = sorted(
            n for n in REGISTRY
            if n not in assigned and any(n.startswith(p) for p in prefixes)
        )
        if not names:
            continue
        assigned.update(names)
        out.append(f"## {title}")
        out.append("")
        out.append("| query | oracle | what it checks |")
        out.append("|---|---|---|")
        for n in names:
            fn, sql = REGISTRY[n]
            mark = "yes" if sql is not None else "rows-only"
            out.append(f"| `{n}` | {mark} | {first_line(fn)} |")
        out.append("")
    leftover = sorted(set(REGISTRY) - assigned)
    if leftover:
        raise SystemExit(f"ungrouped queries: {leftover}")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "QUERIES.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(REGISTRY)} queries")


if __name__ == "__main__":
    main()
