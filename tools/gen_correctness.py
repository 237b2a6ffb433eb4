#!/usr/bin/env python
"""Generate CORRECTNESS_local.json — the auditable local twin of the
driver's CORRECTNESS_r{N}.json (VERDICT r6 #2: the driver has sampled
the same 50 query names since round 4, so ~100 registered queries have
no external correctness row; this artifact gives every query one, in
the driver's exact per-query format, regenerated at HEAD each round).

Per query (driver format):
  rows_match / schema_match / hash_match / spark_rows / oracle_rows / err
Oracle-less queries (engine-specific RNG/HLL/kmeans) get the driver's
weaker rows-only row: spark_rows>0 recorded, oracle fields null,
"rows_only": true. FLOAT_TOL queries compare those columns numerically
within the enforced tolerance (tests/oracle_harness.py) — hash_match
then reports THAT comparison, with "float_tol" noting the column map.

A _meta block stamps the generating commit and a registry hash (sorted
query names + oracle SQL), and tests/test_correctness_artifact.py
recomputes the hash at import — editing a query or oracle without
regenerating the artifact fails the suite, so staleness is mechanical
to detect (same posture as the EXPLAIN.md drift test).

Stamp convention: the artifact is generated BEFORE the commit that
includes it, so `_meta.commit` names the PARENT of that commit (suffixed
`+dirty` when the worktree had uncommitted changes at generation time).
Freshness is guaranteed by the live registry-hash test, not the stamp.

Run: python tools/gen_correctness.py   (default sf0.01, the driver's SF)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from oracle_harness import FLOAT_TOL, compare, run_oracle  # noqa: E402

from pulsar_internal_spark.plans.queries import ORACLES, QUERIES  # noqa: E402
from pulsar_internal_spark.session import get_spark  # noqa: E402


def registry_hash() -> str:
    """Order-independent fingerprint of the live registry: names + oracle
    SQL. Changing either without regenerating the artifact is detected."""
    payload = json.dumps(
        sorted((n, ORACLES.get(n)) for n in QUERIES), ensure_ascii=True
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="pulsar_internal_spark_correctness")
    spark.sparkContext.setLogLevel("ERROR")

    result: dict[str, dict] = {}
    for name in sorted(QUERIES):
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = QUERIES[name](spark, sf_dir)
            if name in ORACLES:
                opdf = run_oracle(ORACLES[name], sf_dir)
                spdf = sdf.toPandas()
                row["spark_rows"] = len(spdf)
                row["oracle_rows"] = len(opdf)
                row["rows_match"] = len(spdf) == len(opdf)
                row["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
                tol = FLOAT_TOL.get(name)
                problems = compare(sdf, opdf, float_tol=tol)
                row["hash_match"] = not problems
                if problems:
                    row["err"] = "; ".join(problems[:3])
                if tol:
                    row["float_tol"] = tol
            else:
                n = sdf.count()
                row["spark_rows"] = n
                row["rows_match"] = n > 0
                row["rows_only"] = True
        except Exception as e:  # noqa: BLE001 — artifact must record, not die
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        result[name] = row
        status = "OK" if not row["err"] else "ERR"
        print(f"{status} {name}", file=sys.stderr, flush=True)

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.strip()
    if subprocess.run(
        ["git", "status", "--porcelain"], capture_output=True, text=True, cwd=REPO
    ).stdout.strip():
        commit += "+dirty"
    n_bad = sum(
        1
        for r in result.values()
        if r["err"] or r["rows_match"] is False or r["hash_match"] is False
    )
    out = {
        "_meta": {
            "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "commit": commit,
            "sf_dir": sf_dir,
            "registry_hash": registry_hash(),
            "n_queries": len(result),
            "n_oracle_backed": sum(1 for n in result if n in ORACLES),
            "n_failing": n_bad,
        }
    }
    out.update(result)
    path = os.path.join(REPO, "CORRECTNESS_local.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["_meta"]))
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
