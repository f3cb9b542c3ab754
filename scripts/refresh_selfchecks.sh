#!/bin/sh
# Refresh the committed end-of-round selfcheck artifacts — one run per
# scale with the sf_dir argv and the SELFCHECK_OUT name set TOGETHER, so
# the r8 failure mode (varying only the env var and committing one run
# under three names) cannot recur; selfcheck.py additionally hard-errors
# on a name/sf_dir mismatch, and tests/test_artifacts.py checks the
# committed files' _env stamps against their filenames.
#
# Run this as the LAST code-affecting step of a round, so the artifacts'
# _env.git_sha (recorded per sweep) certifies the code that ships.
#
# Usage: sh scripts/refresh_selfchecks.sh   (from the repo root; ~40 min, 7 sweeps)
set -e
cd "$(dirname "$0")/.."
SELFCHECK_OUT=SELFCHECK_sf001.json python scripts/selfcheck.py /root/testdata/sf0.001
SELFCHECK_OUT=SELFCHECK_sf01.json  python scripts/selfcheck.py /root/testdata/sf0.01
SELFCHECK_OUT=SELFCHECK_sf1.json   python scripts/selfcheck.py /root/testdata/sf0.1
SPARK_GRAFT_HOSTILE=1 SELFCHECK_OUT=SELFCHECK_hostile.json \
    python scripts/selfcheck.py /root/testdata/sf0.01
SPARK_GRAFT_HOSTILE=1 SPARK_GRAFT_ROWREADER=1 \
    SELFCHECK_OUT=SELFCHECK_hostile_rowreader.json \
    python scripts/selfcheck.py /root/testdata/sf0.01
# hostile at sf0.1 (r9 verdict, Next round #7): timezone/partition-count
# interactions are the one axis combination the sf0.01-only hostile sweep
# never exercised
SPARK_GRAFT_HOSTILE=1 SELFCHECK_OUT=SELFCHECK_hostile_sf1.json \
    python scripts/selfcheck.py /root/testdata/sf0.1
# hostile + row-at-a-time reader at sf0.1 completes the axis matrix
# ({3 scales} x {hostile} x {rowreader}): larger row groups exercise the
# non-vectorized decode path differently than sf0.01's
SPARK_GRAFT_HOSTILE=1 SPARK_GRAFT_ROWREADER=1 \
    SELFCHECK_OUT=SELFCHECK_hostile_rowreader_sf1.json \
    python scripts/selfcheck.py /root/testdata/sf0.1
