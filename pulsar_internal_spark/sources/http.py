"""HTTP ingestion: HttpGet/HttpPost/request → D7 response records.

The reference's HTTP surface (http.hpp:139-294 request machinery;
:450-496 response record construction) fetches a URL and materializes a
fixed-shape record {Success, StatusCode, StatusMessage, Headers,
Cookies, Body}. This module is the Spark-side analogue, stdlib-only:

- :func:`http_request` — the bounded front door: fetch an explicit
  request list on the driver and return the records as a DataFrame
  (the reference's call-at-a-time semantics; request count is the
  caller's batch, like the lpframes spool).
- :func:`http_fetch_distributed` — the 100 TB shape: a DataFrame OF
  requests (url/method/body columns) fetched executor-side via
  Arrow-batched mapInPandas, so a million-row URL table fans out
  across the cluster instead of serializing through the driver.

Failures never fail the job: a connect error or timeout yields a row
with Success=false, StatusCode=0 and the error text in StatusMessage —
keep-the-evidence, same policy as the lpframes oversized flag.

The status-phrase table mirrors http.hpp:38-64 (standard RFC phrases);
the in-plan lookup twin is the oracle-checked ``status_phrase`` query.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# http.hpp:38-64 phrase map (standard RFC 9110 reason phrases)
STATUS_PHRASES = {
    100: "Continue", 101: "Switching Protocols", 200: "OK", 201: "Created",
    202: "Accepted", 204: "No Content", 301: "Moved Permanently",
    302: "Found", 304: "Not Modified", 400: "Bad Request",
    401: "Unauthorized", 403: "Forbidden", 404: "Not Found",
    405: "Method Not Allowed", 408: "Request Timeout",
    429: "Too Many Requests", 500: "Internal Server Error",
    502: "Bad Gateway", 503: "Service Unavailable", 504: "Gateway Timeout",
}

# D7 record (http.hpp:450-496) + the request url for lineage
HTTP_RECORD_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("Success", BooleanType()),
        StructField("StatusCode", IntegerType()),
        StructField("StatusMessage", StringType()),
        StructField("Headers", MapType(StringType(), StringType())),
        StructField("Cookies", MapType(StringType(), StringType())),
        StructField("Body", StringType()),
    ]
)


def _parse_cookies(header_items) -> dict[str, str]:
    """Set-Cookie headers → {name: value} (first attribute only, the
    reference keeps name=value and drops attributes)."""
    cookies: dict[str, str] = {}
    for k, v in header_items:
        if k.lower() == "set-cookie" and "=" in v:
            name, val = v.split(";", 1)[0].split("=", 1)
            cookies[name.strip()] = val.strip()
    return cookies


def fetch_record(
    url: str,
    method: str = "GET",
    headers: dict[str, str] | None = None,
    body: bytes | str | None = None,
    timeout: float = 30.0,
) -> dict:
    """Fetch one URL and build the D7 record dict. Never raises —
    transport failures become Success=false rows."""
    import urllib.error
    import urllib.request

    data = body.encode("utf-8") if isinstance(body, str) else body
    try:
        # Request construction itself validates the URL (a schemeless or
        # malformed url raises ValueError here) — it must be inside the
        # never-raises envelope or one bad row kills a distributed fetch
        req = urllib.request.Request(
            url, data=data, headers=headers or {}, method=method.upper()
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            code = resp.status
            hdrs = list(resp.getheaders())
            payload = resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a response
        code = e.code
        hdrs = list(e.headers.items()) if e.headers else []
        try:
            payload = e.read()
        except Exception:
            payload = b""
    except Exception as e:  # connect/timeout/DNS: evidence row
        return {
            "url": url, "Success": False, "StatusCode": 0,
            "StatusMessage": f"{type(e).__name__}: {e}",
            "Headers": {}, "Cookies": {}, "Body": "",
        }
    return {
        "url": url,
        "Success": 200 <= code < 400,
        "StatusCode": code,
        "StatusMessage": STATUS_PHRASES.get(code, "Unknown"),
        "Headers": {k.lower(): v for k, v in hdrs},
        "Cookies": _parse_cookies(hdrs),
        "Body": payload.decode("utf-8", errors="replace"),
    }


def http_request(
    spark: SparkSession,
    requests: list[dict],
    timeout: float = 30.0,
) -> DataFrame:
    """Driver-side HttpGet/HttpPost front door: fetch an explicit list
    of request dicts ({url, method?, headers?, body?}) and return the
    D7 records as a DataFrame. For large URL tables use
    :func:`http_fetch_distributed` — this path is the reference's
    bounded call-at-a-time semantics, not a crawler."""
    rows = [
        fetch_record(
            r["url"],
            r.get("method", "GET"),
            r.get("headers"),
            r.get("body"),
            timeout,
        )
        for r in requests
    ]
    return spark.createDataFrame(rows, HTTP_RECORD_SCHEMA)


def http_fetch_distributed(
    df: DataFrame,
    url_col: str = "url",
    method_col: str | None = None,
    body_col: str | None = None,
    timeout: float = 30.0,
) -> DataFrame:
    """Executor-side fetch of a request TABLE: each partition's workers
    fetch their rows (Arrow-batched mapInPandas), so throughput scales
    with the cluster, the driver never sees a payload, and a dead URL
    costs one evidence row, not a task retry. Partition the input by
    target host if politeness/connection reuse matters upstream.
    Null method/body cells are treated as absent."""
    import pandas as pd

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in HTTP_RECORD_SCHEMA.fields}
            for _, row in pdf.iterrows():
                # null method/body arrive as NaN through Arrow — treat
                # as absent, not the string "nan"
                method = row[method_col] if method_col else None
                method = "GET" if method is None or pd.isna(method) else str(method)
                body = row[body_col] if body_col else None
                body = None if body is None or pd.isna(body) else str(body)
                rec = fetch_record(row[url_col], method, None, body, timeout)
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    cols = [c for c in (url_col, method_col, body_col) if c]
    return df.select(*cols).mapInPandas(fetch, HTTP_RECORD_SCHEMA)
