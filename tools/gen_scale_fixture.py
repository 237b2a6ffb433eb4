#!/usr/bin/env python
"""Generate a scaled-up fixture (default 10x = sf1.0) from the driver's
sf0.1 parquet tables, for the empirical scale-up proof (VERDICT r6 #1).

Scaling model — "another day of the same workload", not "the same rows
again": every copy is a key-shifted replica whose CONTENT is decorrelated
from the other copies, so data volume grows 10x while selectivities,
duplicate RATES and per-key group sizes stay constant. Naive replication
would be pathological, not realistic: identical documents would turn
every MinHash/SimHash band bucket into a 10-clique (candidate pairs grow
100x, not 10x) and identical embeddings would do the same to sign-LSH
buckets — measuring that measures the fixture, not the operator.

Per-table treatment (STRIDE = 1e9, divisible by every modulus the query
suite uses — vec_id % 100, % 2 parity splits — so query-side fractions
are scale-invariant):
- region, nation: fixed dimensions, single copy (TPC-H's own model).
- customer/supplier/part/orders/lineitem: all keys shifted by
  copy*STRIDE, FK columns shifted in lockstep so referential integrity
  holds within each copy; dates/amounts untouched (same date range at
  10x density — the correct densification for window/agg scaling).
- events: event_id/user_id shifted; each copy's TIMELINE shifted by
  copy*64 days (past the ~27-day source span) — 10x users over 10x the
  calendar, so per-minute/hour/session bucket sizes stay CONSTANT.
  Keeping the original timestamps instead densifies every time bucket
  10x, and anything keyed on a time bucket (minute co-occurrence
  edges, hour-range joins) grows quadratically in the factor (measured
  139x candidate pairs at 10x) — a fixture artifact, same class as the
  identical-document 10-clique above.
- documents: doc_id shifted; every TOKEN gets a per-copy suffix
  (regexp '(\\S+)' -> '\\1xN'), so within-copy near-dup structure is
  EXACTLY the original corpus's while cross-copy shingle/k-gram overlap
  is zero. n_chars recomputed.
- embeddings: vec_id shifted; vector circularly rotated by copy index
  MOD 64 (the fixture dim), NEGATED on the second lap (copies 64-127) —
  rotation by 64 is the identity, so without the sign flip copy 64+j
  would be content-identical to copy j and every sign-LSH bucket a
  cross-copy clique (the exact pathology this fixture exists to avoid).
  Copies 128+ (round 9, the sf100 regime) compose the rotation with a
  per-copy SEEDED +-1 diagonal sign mask — still orthogonal, so norms
  and within-copy cosines stay exact while distinct masks decorrelate
  copies. All transforms are norm- and within-copy-cosine-preserving;
  copies below 128 regenerate byte-identically to round 8. Label kept.

Output mirrors the driver layout (<out>/<table>.parquet single files) so
load_table() and the DuckDB oracle harness both read it unchanged.
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

STRIDE = 1_000_000_000

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def copy_select(table: str, cols: list[tuple[str, str]], i: int) -> str:
    shift = set(SHIFT_COLS.get(table, []))
    parts = []
    for name, typ in cols:
        if name in shift:
            parts.append(f"{name} + {i * STRIDE} AS {name}")
        elif table == "documents" and name == "text" and i > 0:
            parts.append(rf"regexp_replace(text, '(\S+)', '\1x{i}', 'g') AS text")
        elif table == "documents" and name == "n_chars" and i > 0:
            parts.append(
                rf"CAST(length(regexp_replace(text, '(\S+)', '\1x{i}', 'g')) AS BIGINT) AS n_chars"
            )
        elif table == "events" and name == "ts" and i > 0:
            # each copy is ANOTHER MONTH of the same workload: shift its
            # timeline past the source span (~27 days) so minute/hour/
            # session buckets never collide across copies. Without this,
            # 10 copies densify every minute bucket 10x and any query
            # keyed on a time bucket (co-occurrence edges, range joins)
            # grows QUADRATICALLY in the factor — measured 139x pair
            # growth at factor 10 — which measures the fixture, not the
            # operator. Per-bucket group sizes must stay constant, the
            # same invariant the key STRIDE enforces for id moduli.
            parts.append(f"ts + INTERVAL {i * 64} DAY AS ts")
        elif table == "embeddings" and name == "embedding" and i > 0:
            # circular rotate by i%64 (norm-preserving, kills cross-copy
            # cosine); rotation by 64 on a 64-dim vector is the IDENTITY,
            # so the second lap (i in 64..127) additionally negates —
            # within-copy cosine structure is untouched (cos(-a,-b)=
            # cos(a,b)) while copy 64+j stays decorrelated from copy j.
            # Laps >= 2 (i >= 128, the sf100 regime) compose the rotation
            # with a PER-COPY seeded +-1 diagonal (random sign mask):
            # any diagonal-sign x rotation is orthogonal, so norms and
            # within-copy cosines are still exact, while distinct masks
            # decorrelate copies (collision odds 2^-64 per pair; laps 0/1
            # are the identity/all-minus masks, which seeded masks can
            # only hit at those same odds). Copies i < 128 keep their
            # BYTE-IDENTICAL round-8 transform — sf1.0/sf10 regenerate
            # unchanged.
            r = i % 64
            base = (
                f"(embedding[{r + 1}:] || embedding[1:{r}])" if r else "embedding"
            )
            lap = i // 64
            if lap == 1:
                base = f"list_transform({base}, v -> -v)"
                parts.append(f"{base}::FLOAT[] AS embedding")
            elif lap >= 2:
                import numpy as np

                signs = np.random.default_rng(10_000 + i).choice(
                    [-1.0, 1.0], size=64
                )
                assert (signs > 0).any() and (signs < 0).any(), i
                mask = ", ".join("-1.0" if s < 0 else "1.0" for s in signs)
                parts.append(
                    f"list_transform(list_zip({base}, [{mask}]), "
                    "p -> p[1] * p[2])::FLOAT[] AS embedding"
                )
            else:
                parts.append(f"{base}::FLOAT[] AS embedding")
        else:
            parts.append(name)
    return ", ".join(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, help="default: <repo>/.scale/sf1.0")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset of TABLES (default: all — a sf100 "
        "scouting fixture can skip tables its control queries never read)",
    )
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out or os.path.join(repo, ".scale", "sf1.0")
    os.makedirs(out, exist_ok=True)
    tables = args.tables.split(",") if args.tables else TABLES
    unknown = set(tables) - set(TABLES)
    if unknown:
        raise SystemExit(f"unknown tables: {sorted(unknown)}")

    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")
    # a factor-1000 plan is a 1000-way UNION ALL — past the default
    # parser depth (1000); the plan itself streams fine
    con.execute("SET max_expression_depth TO 100000")
    for t in tables:
        src = os.path.join(args.src, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{src}')"
        )
        cols = [
            (r[0], r[1])
            for r in con.execute("DESCRIBE src").fetchall()
        ]
        if t in ("region", "nation"):
            sel = "SELECT * FROM src"
        else:
            sel = " UNION ALL ".join(
                f"SELECT {copy_select(t, cols, i)} FROM src"
                for i in range(args.factor)
            )
        con.execute(f"COPY ({sel}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}", flush=True)


if __name__ == "__main__":
    main()
