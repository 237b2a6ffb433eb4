"""Differential test: every queries() entry with an oracle must match it
(the driver's correctness gate, run locally at sf0.001 for speed —
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to mirror the driver
exactly)."""

from __future__ import annotations

import pytest

from pulsar_internal_spark.plans.queries import ORACLES, QUERIES

from .oracle_harness import compare, run_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    opdf = run_oracle(ORACLES[name], sf_dir)
    problems = compare(sdf, opdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_entry():
    assert QUERIES, "query registry is empty"
    missing = [n for n in ORACLES if n not in QUERIES]
    assert not missing


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None
