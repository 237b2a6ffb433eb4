#!/bin/sh
# Sub-minute meta-test smoke — run before EVERY commit (VERDICT r10 #1:
# the round-10 HEAD shipped red because the final commits skipped the
# full suite; these gates collect in seconds and catch exactly that
# class — an uncited registered query, a stale CORRECTNESS_local.json
# registry hash, a drifted pinned plan shape, a broken bench contract).
#
# Usage: sh tools/smoke_meta.sh      (~60 s, one local Spark session)
set -e
cd "$(dirname "$0")/.."
exec python -m pytest -q \
  tests/test_queries_vs_oracle.py::test_every_query_documents_its_lineage \
  tests/test_queries_vs_oracle.py::test_every_query_has_entry \
  tests/test_correctness_artifact.py \
  tests/test_explain_drift.py
