"""EXPLAIN.md staleness ENFORCEMENT (VERDICT r6 #5): the committed
EXPLAIN.hashes.json pins a normalized hash of every headline query's
STATIC physical plan; this test recomputes each hash at HEAD and fails
on drift, replacing the manual "stamp lags HEAD" convention. Runtime
AQE decisions are out of scope by design — code changes move the
static plan, and that is what regeneration tracks.

Plans are built at the GENERATOR's sf (0.01) regardless of the suite's
sf fixture, so path/statistics differences never enter the hash (the
normalizer strips session-variant tokens: expression ids, partition
counts, file paths — see tools/gen_explain.normalize_plan).

On failure: `python tools/gen_explain.py` (regenerates EXPLAIN.md and
the hash sidecar in one step — the stamp then matches the regeneration
commit by construction).
"""

from __future__ import annotations

import json
import os

import pytest

from tools.gen_explain import HEADLINERS, SF_DIR, plan_hash

from pulsar_internal_spark.plans.queries import QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _hashes():
    with open(os.path.join(REPO, "EXPLAIN.hashes.json")) as f:
        return json.load(f)


def test_hash_sidecar_covers_headliners():
    got = {k for k in _hashes() if not k.startswith("_")}
    want = {name for name, _ in HEADLINERS}
    assert got == want, (
        f"EXPLAIN.hashes.json drift: only_sidecar={sorted(got - want)} "
        f"only_headliners={sorted(want - got)} — rerun tools/gen_explain.py"
    )
    assert _hashes()["_meta"]["commit"]


def test_explain_md_has_a_section_per_headliner():
    with open(os.path.join(REPO, "EXPLAIN.md")) as f:
        md = f.read()
    missing = [name for name, _ in HEADLINERS if f"## {name}" not in md]
    assert not missing, f"EXPLAIN.md missing sections: {missing}"


@pytest.mark.parametrize("name", [n for n, _ in HEADLINERS])
def test_plan_matches_recorded_hash(spark, name):
    want = _hashes()[name]
    got = plan_hash(QUERIES[name](spark, SF_DIR))
    assert got == want, (
        f"{name}: static physical plan changed since EXPLAIN.md was "
        f"generated (hash {got} != recorded {want}) — rerun "
        "tools/gen_explain.py to regenerate EXPLAIN.md + hashes"
    )
