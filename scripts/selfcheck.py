"""Local mimic of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and, where an ``oracle_sql()``
entry exists, the same-named SQL on DuckDB over the same parquet files;
compares row count, sorted column names, and an order-insensitive value
hash (rows rendered to strings, column-sorted, row-sorted, md5).

Usage: python scripts/selfcheck.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _render(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    rendered = sorted(
        "\x01".join(_render(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in rendered:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def expected_sf_basename(out_path: str) -> str | None:
    """For a scale-named artifact ``SELFCHECK_sf<digits>.json``, the sf_dir
    basename that artifact claims to cover (naming scheme: ``sf0.001`` →
    ``SELFCHECK_sf001``, i.e. drop the ``0.``).  None for non-scale names
    (hostile, /tmp outputs)."""
    import re

    m = re.fullmatch(
        r"SELFCHECK_(?:[a-z_]+_)?sf(\d+)\.json", os.path.basename(out_path)
    )
    if not m:
        return None
    return f"sf0.{m.group(1)}"


def _guard_out_name_matches_sf(out_path: str, sf_dir: str) -> None:
    """Refuse to write a scale-named artifact whose data directory does not
    match the name.  Root cause of the r8 blemish: the end-of-round refresh
    varied only SELFCHECK_OUT while argv[1] stayed at the default, so one
    sf0.01 run was committed under all three scale names — `_env.sf_dir`
    recorded the truth, but the filenames claimed a three-scale sweep.
    This guard makes that loop-authoring mistake a hard error instead of a
    silently-mislabeled artifact."""
    want = expected_sf_basename(out_path)
    got = os.path.basename(sf_dir.rstrip("/"))
    if want is not None and got != want:
        raise SystemExit(
            f"SELFCHECK_OUT={os.path.basename(out_path)} claims scale "
            f"'{want}' but sf_dir argv is '{got}' — pass the matching "
            f"sf_dir (scripts/refresh_selfchecks.sh does this per scale)"
        )
    # axis-named artifacts must actually run under that axis (same class of
    # mislabeling as the scale guard: a 'hostile'-named file produced by a
    # default-conf run is false evidence)
    base = os.path.basename(out_path)
    if "hostile" in base and not os.environ.get("SPARK_GRAFT_HOSTILE"):
        raise SystemExit(
            f"SELFCHECK_OUT={base} is hostile-named but SPARK_GRAFT_HOSTILE "
            f"is unset — set it or rename the output"
        )
    if "rowreader" in base and not os.environ.get("SPARK_GRAFT_ROWREADER"):
        raise SystemExit(
            f"SELFCHECK_OUT={base} is rowreader-named but "
            f"SPARK_GRAFT_ROWREADER is unset — set it or rename the output"
        )
    # ... and the REVERSE direction (r10 review): a leftover exported
    # SPARK_GRAFT_HOSTILE/ROWREADER must not contaminate a default-named
    # committed artifact — the three plain scale sweeps would then all run
    # hostile while their names (and the artifact guard tests, which only
    # check hostile-named files for hostile=True) claim default-conf
    # coverage.  Scoped to SELFCHECK_* names: ad-hoc hostile runs writing
    # /tmp outputs stay legitimate.
    if base.startswith("SELFCHECK_"):
        if "hostile" not in base and os.environ.get("SPARK_GRAFT_HOSTILE"):
            raise SystemExit(
                f"SPARK_GRAFT_HOSTILE is set but SELFCHECK_OUT={base} is not "
                f"hostile-named — unset the env var or name the output for "
                f"the axis it actually ran"
            )
        if "rowreader" not in base and os.environ.get("SPARK_GRAFT_ROWREADER"):
            raise SystemExit(
                f"SPARK_GRAFT_ROWREADER is set but SELFCHECK_OUT={base} is "
                f"not rowreader-named — unset the env var or name the output "
                f"for the axis it actually ran"
            )


def git_provenance() -> dict:
    """(sha, dirty) of the repo the sweep actually certified — the r9
    provenance gap: the committed artifacts could not prove WHICH code
    they ran against.  `git_dirty` ignores the SELFCHECK_*.json artifacts
    themselves (the refresh loop's earlier sweeps dirty them for later
    sweeps by design); any OTHER dirty tracked file is listed so the
    artifact is self-describing.  Defensive: any git failure records
    None rather than breaking the sweep."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=repo, capture_output=True, text=True, timeout=30, check=True,
        ).stdout.strip()
        status = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=repo, capture_output=True, text=True, timeout=30, check=True,
        ).stdout.splitlines()
        dirty = [
            line[3:]
            for line in status
            if line and not os.path.basename(line[3:]).startswith("SELFCHECK_")
        ]
        return {
            "git_sha": sha,
            "git_dirty": bool(dirty),
            "git_dirty_files": dirty[:10],
        }
    except Exception:  # pragma: no cover - git unavailable
        return {"git_sha": None, "git_dirty": None, "git_dirty_files": None}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    # guard BEFORE the sweep: this reads only argv/env, and failing after
    # minutes of queries would waste the whole run (and, under the refresh
    # script's set -e, abort the remaining scales too)
    out_path = os.environ.get("SELFCHECK_OUT", "/tmp/verify_local.json")
    _guard_out_name_matches_sf(out_path, sf_dir)

    import duckdb

    import __spark_entry__ as e
    from bulkfhirloader_spark.session import get_spark

    # HOSTILE mode (SPARK_GRAFT_HOSTILE=1): the external driver passes its
    # OWN SparkSession, so none of get_spark's curated defaults (UTC
    # session TZ, AQE, our shuffle sizing) can be assumed there.  This
    # mode runs the whole registry under an adversarial session — a +14
    # session timezone, a prime shuffle-partition count, AQE off, ANSI
    # pinned on — so every hash must hold by CONSTRUCTION, not by session
    # config.  Queries that legitimately need a conf must set it
    # themselves (the _utc() pattern).  Artifact: SELFCHECK_OUT as usual.
    # r7 advisor finding: 34 registry queries call _utc(), which sets the
    # session TZ to UTC and leaves it set — so asserting the hostile conf
    # only at session build meant every query after the first _utc caller
    # ran under UTC, and the "+14 TZ" sweep only genuinely covered the
    # queries before it.  Fix: re-assert the hostile confs before EACH
    # query (hostile_conf below is re-applied inside the loop) and record
    # the per-query session TZ observed after the query ran, so the
    # artifact proves which TZ each hash was computed under.
    hostile_conf = {
        "spark.sql.session.timeZone": "Pacific/Kiritimati",
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.ansi.enabled": "true",
        # r8 axis: a case-sensitive analyzer breaks any query relying on
        # case-insensitive column resolution
        "spark.sql.caseSensitive": "true",
    }
    hostile = bool(os.environ.get("SPARK_GRAFT_HOSTILE"))
    # ROWREADER axis (SPARK_GRAFT_ROWREADER=1, composes with HOSTILE): turn
    # OFF the vectorized parquet/ORC readers so every scan takes the
    # row-at-a-time path — hashes must not depend on the columnar reader's
    # batch layout or its type-widening behavior.  Re-asserted per query
    # like the hostile confs (it's a runtime SQL conf) and recorded in _env.
    rowreader = bool(os.environ.get("SPARK_GRAFT_ROWREADER"))
    reader_conf = {
        "spark.sql.parquet.enableVectorizedReader": "false",
        "spark.sql.orc.enableVectorizedReader": "false",
    }
    # per-query re-asserted confs: the hostile set when hostile, plus the
    # row-reader axis when requested (composable: HOSTILE=1 ROWREADER=1
    # sweeps both at once)
    assert_conf = dict(hostile_conf) if hostile else {}
    if rowreader:
        assert_conf.update(reader_conf)
    if hostile:
        spark = get_spark(
            app_name="bulkfhirloader-selfcheck-hostile",
            shuffle_partitions=7,
            extra_conf={k: v for k, v in assert_conf.items()
                        if k != "spark.sql.shuffle.partitions"},
        )
    elif rowreader:
        spark = get_spark(
            app_name="bulkfhirloader-selfcheck-rowreader",
            shuffle_partitions=8,
            extra_conf=dict(reader_conf),
        )
    else:
        spark = get_spark(shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    results = {}
    n_fail = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.monotonic()
        rec: dict = {}
        if assert_conf:
            # re-assert per query: _utc()-calling queries reset the session
            # TZ to UTC and a single session-build assertion would shield
            # every later query from the hostile TZ (r7 advisor finding)
            for k, v in assert_conf.items():
                spark.conf.set(k, v)
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(rows)
            rec["spark_cols"] = sorted(cols)
            rec["spark_hash"] = value_hash(rows, cols)
            if hostile:
                rec["session_tz_after"] = spark.conf.get(
                    "spark.sql.session.timeZone", None
                )
        except Exception as ex:
            rec["error"] = f"spark: {type(ex).__name__}: {ex}"
            traceback.print_exc(limit=3)
            results[name] = rec
            n_fail += 1
            print(f"FAIL  {name}: spark error")
            continue
        sql = oracles.get(name)
        if sql is None:
            rec["mode"] = "rows_only"
            ok = rec["spark_rows"] >= 0
            print(f"{'ok   ' if ok else 'FAIL '} {name}: rows-only, {rec['spark_rows']} rows "
                  f"({time.monotonic()-t0:.1f}s)")
            results[name] = rec
            continue
        try:
            cur = con.execute(sql)
            ora_cols = [d[0] for d in cur.description]
            ora_rows = cur.fetchall()
            rec["oracle_rows"] = len(ora_rows)
            rec["oracle_cols"] = sorted(ora_cols)
            rec["oracle_hash"] = value_hash(ora_rows, ora_cols)
        except Exception as ex:
            rec["error"] = f"duckdb: {type(ex).__name__}: {ex}"
            results[name] = rec
            n_fail += 1
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
        rec["schema_match"] = rec["spark_cols"] == rec["oracle_cols"]
        rec["hash_match"] = rec["spark_hash"] == rec["oracle_hash"]
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        if not ok:
            n_fail += 1
        print(
            f"{'ok   ' if ok else 'FAIL '} {name}: rows {rec['spark_rows']}/{rec['oracle_rows']} "
            f"schema={'Y' if rec['schema_match'] else 'N'} hash={'Y' if rec['hash_match'] else 'N'} "
            f"({time.monotonic()-t0:.1f}s)"
        )
        results[name] = rec

    # Environment diagnostics for hunting env-sensitive mismatches (the r5
    # src_* reds): record what the hash-relevant session state actually was.
    # Re-assert the sweep confs first so _env records the state each query
    # STARTED under (a _utc()-calling final query would otherwise leave its
    # own UTC here and make the artifact look non-hostile); the per-query
    # post-state is already recorded as session_tz_after.
    for k, v in assert_conf.items():
        spark.conf.set(k, v)
    results["_env"] = {
        "sf_dir": sf_dir,
        **git_provenance(),
        "session_tz": spark.conf.get("spark.sql.session.timeZone", None),
        "os_tz": os.environ.get("TZ"),
        "spark_version": spark.version,
        "hostile": bool(os.environ.get("SPARK_GRAFT_HOSTILE")),
        "rowreader": rowreader,
        "vectorized_parquet_reader": spark.conf.get(
            "spark.sql.parquet.enableVectorizedReader", None
        ),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions", None),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled", None),
        "ansi": spark.conf.get("spark.sql.ansi.enabled", None),
        "case_sensitive": spark.conf.get("spark.sql.caseSensitive", None),
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"\n{len(results) - 1} queries, {n_fail} failing -> {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
