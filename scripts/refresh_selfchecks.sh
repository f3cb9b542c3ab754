#!/bin/sh
# Refresh the committed end-of-round selfcheck artifacts — one run per
# scale with the sf_dir argv and the SELFCHECK_OUT name set TOGETHER, so
# the r8 failure mode (varying only the env var and committing one run
# under three names) cannot recur; selfcheck.py additionally hard-errors
# on a name/sf_dir mismatch, and tests/test_artifacts.py checks the
# committed files' _env stamps against their filenames.
#
# Usage: sh scripts/refresh_selfchecks.sh   (from the repo root; ~25 min, 5 sweeps)
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
