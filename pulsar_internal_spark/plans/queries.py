"""The named query suite: every implemented operator from SURVEY.md §2
as a (Spark DataFrame plan, DuckDB oracle SQL) pair.

Conventions (driver contract, __spark_entry__.py):
  - each Spark fn takes (spark, sf_dir) and returns a DataFrame;
  - every computed column is aliased identically in Spark and oracle SQL;
  - counts are BIGINT in both engines (DuckDB COUNT already is; SUM over
    integers is CAST to BIGINT to avoid HUGEINT);
  - double aggregates are ROUND()ed so partial-aggregation order cannot
    flip the last ulp between engines;
  - timestamps are bucketed (date_trunc) and rendered as strings so the
    parquet ns -> us truncation is irrelevant.

Reference citations in each docstring point at the behavior being
re-expressed (see SURVEY.md §2 for the full mapping table).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import compaction as compaction_ops
from ..operators import dedup as dedup_ops
from ..operators import similarity as sim_ops
from ..operators import textops
from ..operators import tree as tree_ops
from ..sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =========================================================================
# Tree / scan / filter family (SURVEY.md §2.2)
# =========================================================================


@_register(
    "orphan_customers",
    """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS idx,
           c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def orphan_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP. `getnilinstances` (instance.hpp:59-104): nodes whose
    parent pointer doesn't resolve in the *filtered* registry (the
    reference scans only Instance-typed registry values, instance.hpp:
    36-43) = LEFT ANTI join against a filtered parent set + dense
    re-index (the reference's `++index` re-sequencing, instance.hpp:30,44).
    The parent filter (high-value orders) pushes down to the parquet scan.
    """
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    orphan = tree_ops.orphans(customer, orders.select("o_custkey"), "c_custkey", "o_custkey")
    return tree_ops.reindex(orphan, ["c_custkey"]).select(
        F.col("idx").cast("long").alias("idx"),
        "c_custkey",
        "c_name",
        "c_mktsegment",
    )


@_register(
    "class_filter_scan",
    """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_type IN ('error', 'purchase')
    """,
)
def class_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`getscripts` (script.hpp:362-412): scan + multi-value class
    predicate (`ClassName IN {...}`, script.hpp:391-392) -> isin filter
    pushed to the parquet scan."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("error", "purchase"))
        .select("event_id", "user_id", "event_type", "value")
    )


@_register(
    "blocklist_anti_join",
    """
    SELECT doc_id, source, lang FROM documents
    WHERE source NOT IN ('src0', 'src7', 'src13')
    """,
)
def blocklist_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsafe-name blocklist hook (env.cpp:29-56): filter rows whose key
    is on a blocklist dimension -> broadcast LEFT ANTI join (the 90-name
    list generalizes to any size; broadcast keeps it shuffle-free)."""
    docs = _t(spark, sf_dir, "documents")
    blocklist = spark.createDataFrame(
        [("src0",), ("src7",), ("src13",)], ["blocked_source"]
    )
    return docs.join(
        F.broadcast(blocklist),
        docs["source"] == blocklist["blocked_source"],
        "left_anti",
    ).select("doc_id", "source", "lang")


@_register(
    "semi_join_active_customers",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_active
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`isnetworkowner`-style membership predicate (instance.hpp:106-165):
    keep rows with a match in another set -> LEFT SEMI join + count."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@_register(
    "binary_heuristic",
    """
    SELECT ascii(substr(text, 1, 1)) AS first_code,
           (ascii(substr(text, 1, 1)) <= 10 OR
            CAST(length(regexp_replace(substr(text, 1, 100), '[ -~]', '', 'g')) AS DOUBLE)
              / GREATEST(length(substr(text, 1, 100)), 1) > 0.2) AS is_binary,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM documents GROUP BY 1, 2
    """,
)
def binary_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`IsLuauBytecode` (closures.hpp:229-251): first byte <= 10 OR >20%
    non-printables in the first 100 bytes -> pure column arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.ascii(F.substring("text", 1, 1)).alias("first_code"),
            textops.is_binary_like("text").alias("is_binary"),
        )
        .groupBy("first_code", "is_binary")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@_register(
    "ext_blocklist",
    """
    SELECT ext, ext IN ('exe', 'ps1', 'zip', 'bat') AS blocked,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT (['txt','exe','json','ps1','csv'])[(doc_id % 5) + 1] AS ext
      FROM documents
    ) GROUP BY ext, blocked
    """,
)
def ext_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`IsExtensionBlocked` (filesys.hpp:86-105, blocklist :10-43):
    extension classification against a blocklist."""
    docs = _t(spark, sf_dir, "documents")
    ext = F.element_at(
        F.array(*[F.lit(e) for e in ("txt", "exe", "json", "ps1", "csv")]),
        ((F.col("doc_id") % 5) + 1).cast("int"),
    )
    return (
        docs.select(ext.alias("ext"))
        .withColumn("blocked", F.col("ext").isin("exe", "ps1", "zip", "bat"))
        .groupBy("ext", "blocked")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# =========================================================================
# Dedup / compaction family (SURVEY.md §2.4)
# =========================================================================


@_register(
    "dedup_first_event",
    """
    SELECT user_id, event_id AS first_event_id, event_type AS first_event_type
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
    """,
)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`getrunningscripts` first-seen-wins dedup (script.hpp:246-268):
    keep the first record per key in arrival order."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("event_type").alias("first_event_type"),
        )
    )


@_register(
    "compaction_lww",
    """
    SELECT user_id, event_id AS last_event_id,
           event_type AS last_event_type, value AS last_value
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def compaction_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 keyed cache / topic compaction (cache.hpp:29-43): latest value
    per key. Implemented as ONE hash aggregation (max over an ordered
    struct) — partial-aggregates map-side, unlike a window, so it scales
    to 100 TB with a single shuffle."""
    events = _t(spark, sf_dir, "events")
    out = compaction_ops.compact_last_write_wins(
        events,
        key_cols=["user_id"],
        seq_col="ts",
        payload_cols=["event_id", "event_type", "value"],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@_register(
    "exact_dedup_docs",
    """
    SELECT sha256(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS content_hash,
           MIN(doc_id) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: the reference's script-hash memo
    (script.hpp:127-129) scaled to corpus dedup — groupBy(sha2)."""
    return dedup_ops.exact_dedup(_t(spark, sf_dir, "documents"))


# =========================================================================
# Joins + aggregation family (SURVEY.md §2.3-2.4 — Spark-superset)
# =========================================================================


@_register(
    "capability_lookup",
    """
    WITH dim AS (
      SELECT * FROM (VALUES
        (0, 'lvl0', 1), (1, 'lvl1', 3), (2, 'lvl2', 7), (3, 'lvl3', 15),
        (4, 'lvl4', 31), (5, 'lvl5', 63), (6, 'lvl6', 127), (7, 'lvl7', 255)
      ) AS t(identity, cap_name, capabilities)
    )
    SELECT identity, cap_name,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM (SELECT user_id % 8 AS identity, value FROM events) e
    JOIN dim USING (identity)
    GROUP BY identity, cap_name
    """,
)
def capability_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """identity -> capability-bitmask lookup (miscellaneous.hpp:350-384,
    8-row static table scanned linearly) -> broadcast hash join against a
    tiny dimension, then aggregate."""
    events = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [(i, f"lvl{i}", (1 << (i + 1)) - 1) for i in range(8)],
        ["identity", "cap_name", "capabilities"],
    )
    return (
        events.withColumn("identity", F.col("user_id") % 8)
        .join(F.broadcast(dim), "identity")
        .groupBy("identity", "cap_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@_register(
    "revenue_by_region",
    """
    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join: the fact shuffles once per key chain; nation/
    region are broadcast (AQE converts automatically; the hint makes it
    explicit). No join operator exists in the reference (SURVEY.md §2.3)
    — this is the idiomatic superset required by its lookup semantics."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@_register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped grouped aggregation — the idiomatic superset of the
    reference's counting loops (SURVEY.md §2.4). Predicate pushes down to
    the parquet scan; aggregation is partial+final hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "rollup_region_nation",
    """
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — Spark-superset aggregate (SURVEY.md §2.4
    justification: the reference's only aggregates are counters; rollup is
    the idiomatic multi-level count)."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
    ).join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


@_register(
    "distinct_users_by_type",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count — the exact form of the reference's pointer-dedup
    census (script.hpp:235-247)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@_register(
    "topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
    FROM orders
    QUALIFY rk <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — ranking window (SURVEY.md §2.5: row_number
    replaces the reference's `++index` re-sequencing)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@_register(
    "hourly_event_windows",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window aggregate over the event log (D8/D9) — the
    batch form of the reference's tick-based batching (SURVEY.md §2.11);
    the streaming form lives in streaming/windows.py."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# =========================================================================
# Scalar-function family (SURVEY.md §2.8-2.10)
# =========================================================================


@_register(
    "status_phrase",
    """
    SELECT code,
           CASE code
             WHEN 100 THEN 'Continue' WHEN 101 THEN 'Switching Protocols'
             WHEN 200 THEN 'OK' WHEN 201 THEN 'Created'
             WHEN 202 THEN 'Accepted' WHEN 204 THEN 'No Content'
             WHEN 301 THEN 'Moved Permanently' WHEN 302 THEN 'Found'
             WHEN 304 THEN 'Not Modified' WHEN 400 THEN 'Bad Request'
             WHEN 401 THEN 'Unauthorized' WHEN 403 THEN 'Forbidden'
             WHEN 404 THEN 'Not Found' WHEN 405 THEN 'Method Not Allowed'
             WHEN 408 THEN 'Request Timeout' WHEN 429 THEN 'Too Many Requests'
             WHEN 500 THEN 'Internal Server Error' WHEN 502 THEN 'Bad Gateway'
             WHEN 503 THEN 'Service Unavailable' WHEN 504 THEN 'Gateway Timeout'
             ELSE 'Unknown'
           END AS phrase,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT CASE event_type
               WHEN 'signup' THEN 200 WHEN 'click' THEN 204
               WHEN 'view' THEN 301 WHEN 'purchase' THEN 201
               WHEN 'error' THEN 500 ELSE 999 END AS code
      FROM events
    ) GROUP BY code
    """,
)
def status_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP status code -> phrase lookup (http.hpp:38-64, all 21 cases) as
    a CASE expression; the event_type -> code mapping synthesizes codes
    from the fixture."""
    events = _t(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "signup", 200)
        .when(F.col("event_type") == "click", 204)
        .when(F.col("event_type") == "view", 301)
        .when(F.col("event_type") == "purchase", 201)
        .when(F.col("event_type") == "error", 500)
        .otherwise(999)
    )
    phrases = {
        100: "Continue", 101: "Switching Protocols", 200: "OK", 201: "Created",
        202: "Accepted", 204: "No Content", 301: "Moved Permanently", 302: "Found",
        304: "Not Modified", 400: "Bad Request", 401: "Unauthorized",
        403: "Forbidden", 404: "Not Found", 405: "Method Not Allowed",
        408: "Request Timeout", 429: "Too Many Requests",
        500: "Internal Server Error", 502: "Bad Gateway",
        503: "Service Unavailable", 504: "Gateway Timeout",
    }
    phrase = F.lit("Unknown")
    for c, p in phrases.items():
        phrase = F.when(F.col("code") == c, F.lit(p)).otherwise(phrase)
    return (
        events.select(code.alias("code"))
        .withColumn("phrase", phrase)
        .groupBy("code", "phrase")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("code", "phrase", "cnt")
    )


@_register(
    "base64_roundtrip",
    """
    SELECT doc_id, base64(text::BLOB) AS b64,
           CAST(octet_length(text::BLOB) AS BIGINT) AS decoded_len
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`crypt.base64encode`/`decode` (crypt.hpp:72-222) -> built-in
    base64/unbase64; the decode length proves the roundtrip."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    # Spark base64 is RFC-2045 chunked (\r\n every 76 chars); normalize to
    # the unchunked form DuckDB produces.
    b64 = F.regexp_replace(F.base64(F.encode(F.col("text"), "utf-8")), "\r\n", "")
    return docs.select(
        "doc_id",
        b64.alias("b64"),
        F.length(F.unbase64(b64)).cast("long").alias("decoded_len"),
    )


@_register(
    "error_strip_regex",
    r"""
    SELECT doc_id,
           regexp_replace(
             '[string "' || source || '"]:' || CAST(doc_id % 100 AS VARCHAR)
               || ': boom ' || lang,
             '.*"\]:(\d)*: ', '') AS stripped
    FROM documents
    """,
)
def error_strip_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-message strip (closures.hpp:31-39): regexp_replace with the
    reference's exact pattern `.*"\\]:(\\d)*: ` over synthesized Luau-style
    error strings."""
    docs = _t(spark, sf_dir, "documents")
    err = F.concat(
        F.lit('[string "'),
        F.col("source"),
        F.lit('"]:'),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(": boom "),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.regexp_replace(err, r'.*"\]:(\d)*: ', "").alias("stripped"),
    )


@_register(
    "json_props_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(AVG(value), 2) AS avg_value
    FROM events GROUP BY 1
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON header-blob handling (http.hpp:164-170 builds `{"GameId",...}`
    blobs) -> get_json_object extraction + aggregate."""
    events = _t(spark, sf_dir, "events")
    return (
        events.select(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("value"), 2).alias("avg_value"),
        )
    )


@_register(
    "method_normalization",
    """
    SELECT lower(m) AS method,
           lower(m) IN ('get','head','post','put','delete','options','patch')
             AS valid,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT (['GET','Post','DELETE','trace','PATCH'])[(event_id % 5) + 1] AS m
      FROM events
    ) GROUP BY 1, 2
    """,
)
def method_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP method normalization (http.hpp:346-356: lowercase + 7-verb
    dictionary, map at :28-36) -> lower() + isin validity."""
    events = _t(spark, sf_dir, "events")
    m = F.element_at(
        F.array(*[F.lit(x) for x in ("GET", "Post", "DELETE", "trace", "PATCH")]),
        ((F.col("event_id") % 5) + 1).cast("int"),
    )
    return (
        events.select(F.lower(m).alias("method"))
        .withColumn(
            "valid",
            F.col("method").isin(
                "get", "head", "post", "put", "delete", "options", "patch"
            ),
        )
        .groupBy("method", "valid")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
