"""Capture .explain("formatted") for the headline queries into
plans/r16/<query>_<tag>.txt (tag = before/after), for the r16 optimization
round's plan-diff evidence.

Usage: python scripts/capture_plans_r16.py <before|after> [query ...]
Defaults to every headline query in bench.py plus a few operator-family
representatives.  Runs at sf0.1 (the bench scale) so plan shapes match the
measured numbers.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from bulkfhirloader_spark.queries.registry import REGISTRY  # noqa: E402
from bulkfhirloader_spark.session import get_spark  # noqa: E402

EXTRA = [
    "dedup_minhash_verified",
    "cur_select_for_training",
    "text_winnow_candidates",
    "dedup_semantic_pairs",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [
        n for n in HEADLINE + EXTRA if n in REGISTRY
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"bfls-plans-r16-{tag}")
    for name in names:
        fn, _sql = REGISTRY[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR capturing plan: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
