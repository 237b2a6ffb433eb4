#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into plans/r12/.

Optimization-round evidence (guide §1.3/§7.2): for each query touched
this round the judge checks the claimed plan diff (Exchange count,
join strategy, PushedFilters, Python-eval nodes) against these files.

Usage:
  SPARK_GRAFT_PLANS_TAG=before python tools/r12_plans.py q1 q2 ...
  SPARK_GRAFT_PLANS_TAG=after  python tools/r12_plans.py q1 q2 ...

Writes plans/r12/<query>_<tag>.txt. The dump is the FORMATTED static
physical plan (what code changes move); building a query's DataFrame
also runs its eager staging jobs, so generation doubles as a smoke
run at the chosen SF (default sf0.01 — plan SHAPE is SF-invariant for
every suite query; AQE runtime re-planning is out of scope here).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_internal_spark.plans.queries import QUERIES  # noqa: E402
from pulsar_internal_spark.session import get_spark  # noqa: E402
from pulsar_internal_spark.staging import release_staged  # noqa: E402


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = os.environ.get("SPARK_GRAFT_PLANS_TAG", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_PLANS_SF", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    if not names:
        print("usage: r12_plans.py <query> [<query> ...]", file=sys.stderr)
        sys.exit(2)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r12_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({tag}, {sf_dir}) ==\n\n")
            f.write(plan.rstrip() + "\n")
        release_staged(spark)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
