"""CORRECTNESS_local.json staleness + greenness gate (VERDICT r6 #2).

The artifact gives every registered query an auditable correctness row
in the driver's format (the driver itself samples only 50 names). These
tests make its freshness mechanical: the artifact must exist, cover
exactly the live registry, carry the live registry hash (names + oracle
SQL — regenerate with tools/gen_correctness.py after any query/oracle
edit), and be all-green.
"""

from __future__ import annotations

import json
import os

from pulsar_internal_spark.plans.queries import ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "CORRECTNESS_local.json")


def _load():
    with open(ARTIFACT) as f:
        return json.load(f)


def test_artifact_covers_live_registry():
    data = _load()
    names = {k for k in data if not k.startswith("_")}
    assert names == set(QUERIES), (
        f"artifact/registry drift: only_artifact={sorted(names - set(QUERIES))} "
        f"only_registry={sorted(set(QUERIES) - names)} — rerun tools/gen_correctness.py"
    )


def test_artifact_matches_registry_hash():
    from tools.gen_correctness import registry_hash

    meta = _load()["_meta"]
    assert meta["registry_hash"] == registry_hash(), (
        "a query or oracle changed since CORRECTNESS_local.json was "
        "generated — rerun tools/gen_correctness.py"
    )
    assert meta["n_queries"] == len(QUERIES)
    assert meta["commit"], "artifact missing its generation commit stamp"


def test_artifact_all_green():
    data = _load()
    bad = {}
    for name, row in data.items():
        if name.startswith("_"):
            continue
        if row.get("err") or row.get("rows_match") is False:
            bad[name] = row
        elif name in ORACLES and (
            row.get("hash_match") is not True or row.get("schema_match") is not True
        ):
            bad[name] = row
    assert not bad, f"non-green artifact rows: {json.dumps(bad, indent=1)[:2000]}"
    assert data["_meta"]["n_failing"] == 0
