"""Local mirror of the driver's oracle-differential check.

Runs a Spark query and its DuckDB oracle on the same sf dir, then
compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted by all columns, exact match after
string normalization; doubles compared to 1e-9 relative as a fallback
diagnostic so mismatches are explainable).
"""

from __future__ import annotations

import math
import os

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
            )
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical repr kills 1.0 vs 1 and -0.0 issues
        return repr(round(v, 9) + 0.0)
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def normalize_df(pdf):
    import numpy as np  # noqa: F401

    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    rows.sort()
    return cols, rows


# Per-query float-tolerance columns: transcendental aggregates (double
# log-sums) whose accumulation order is partition- and engine-dependent,
# so exact string equality after ROUND(.., 4) has a latent boundary
# flake (a sum landing within ~1 ulp of a 0.5e-4 rounding boundary can
# flip the last digit between engines). These columns are compared
# NUMERICALLY within the stated absolute tolerance, keyed by the
# query's exact-compared key columns; everything else in the row stays
# exact. 2e-4 = one last-digit flip at 4dp, the only divergence the
# hazard can produce.
FLOAT_TOL: dict[str, dict[str, float]] = {
    "dsir_importance_weights": {"log_importance": 2e-4},
    "token_entropy_scores": {"entropy_bits": 2e-4, "type_token_ratio": 2e-4},
    "bigram_lm_xent": {"xent_bits": 2e-4},
    "bigram_lm_xent_interp": {"xent_interp_bits": 2e-4},
}


def compare(spark_df, oracle_pdf, float_tol: dict[str, float] | None = None) -> list[str]:
    """Return a list of mismatch descriptions (empty == match). With
    ``float_tol`` (column -> absolute tolerance), those columns compare
    numerically after aligning rows on the remaining (exact) columns —
    which must form a unique key."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    if float_tol:
        if len(spark_pdf) != len(oracle_pdf):
            return [
                f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
            ]
        sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
        if sc != oc:
            return [f"columns: spark={sc} oracle={oc}"]
        keys = [c for c in sc if c not in float_tol]

        def _aligned(pdf):
            rows = {}
            for row in pdf[sc].itertuples(index=False):
                d = dict(zip(sc, row))
                rows[tuple(_norm_cell(d[k]) for k in keys)] = d
            return rows

        s_rows, o_rows = _aligned(spark_pdf), _aligned(oracle_pdf)
        if set(s_rows) != set(o_rows):
            for k in list(set(s_rows) ^ set(o_rows))[:5]:
                problems.append(f"key mismatch: {k}")
            return problems
        for k, srow in s_rows.items():
            for col, tol in float_tol.items():
                a, b = float(srow[col]), float(o_rows[k][col])
                if not (abs(a - b) <= tol or (math.isnan(a) and math.isnan(b))):
                    problems.append(
                        f"{col} off by {abs(a - b):.2e} (> {tol}) at key {k}"
                    )
                    if len(problems) >= 5:
                        return problems
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, sr = normalize_df(spark_pdf)
    oc, orows = normalize_df(oracle_pdf)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    if sr != orows:
        n = 0
        for a, b in zip(sr, orows):
            if a != b:
                problems.append(f"row diff: spark={a} oracle={b}")
                n += 1
                if n >= 5:
                    break
        if len(sr) == len(orows) and not problems:
            problems.append("row sets differ (same length)")
        if len(sr) != len(orows):
            only_s = set(sr) - set(orows)
            only_o = set(orows) - set(sr)
            for r in list(only_s)[:3]:
                problems.append(f"only in spark: {r}")
            for r in list(only_o)[:3]:
                problems.append(f"only in oracle: {r}")
    return problems
