"""HTTP/REST reader: the reference's httpreader re-expressed Spark-first.

Reference surface (plugin/reader/httpreader/.../HttpReader.java): GET/POST
with query params and custom headers (:402-418), basic auth (:395-398) and
token auth with configurable header/prefix (:399-404, defaults
Authorization / "Bearer "), a `resultKey` JSONPath picking the record array
out of the response (:443-447), per-column JSONPath extraction with `*`
expanding to the first object's keys (:460-470), and paging that advances
`pageIndex` until a page returns fewer than `pageSize` records
(:309-324). Every value is emitted as a STRING column (processJsonArray
builds StringColumn rows) — typed casts belong to the downstream
transformer/quarantine chain, same as here.

Spark-first split, instead of the reference's single serial task:

- ``max_pages`` known (or a page-id list): the page fan-out becomes a
  ``spark.range`` -> ``mapInPandas`` fetch — every EXECUTOR pulls its own
  pages concurrently (urllib, stdlib-only), which is the only shape that
  scales a bulk REST export; the response bodies never transit the driver.
- ``max_pages`` unknown: the stop-on-short-page probe is inherently
  sequential, so it runs as the reference does — a driver loop — and the
  parsed rows are parallelized afterwards. Fine for control-plane volumes;
  pass max_pages for data-plane ones.

Column projection is shared by both modes and stays JVM-side:
``get_json_object`` over the raw object JSON (same JSONPath dialect as the
jsonfilereader mapping in jobconfig).

TLS notes: https URLs work through urllib's default verification; the
reference's trust-all-certs mode (createInsecureSslContext, :281-291) is
deliberately NOT mirrored. Proxy support is scoped out (no proxy in the
container; urllib honors standard proxy env vars anyway).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class HttpReadSpec:
    url: str
    method: str = "GET"
    params: dict = field(default_factory=dict)
    headers: dict = field(default_factory=dict)
    username: str | None = None
    password: str | None = None
    token: str | None = None
    token_header: str = "Authorization"
    token_prefix: str = "Bearer "
    result_key: str = ""  # JSONPath into the response body; "" = body itself
    columns: list[str] | None = None  # JSONPath per column; None/["*"] = first object's keys
    timeout: int = 60
    # paging (reference pageParams): page index/size query-param names
    page_size: int | None = None
    page_index_key: str = "pageIndex"
    page_size_key: str = "pageSize"
    start_index: int = 1
    max_pages: int | None = None  # known -> executor-parallel fetch
    # safety cap on the sequential stop-on-short-page probe: a server that
    # always returns exactly page_size records (cycling error envelope,
    # off-by-one API) would otherwise spin the driver loop forever,
    # accumulating rows in memory (ADVICE r4). The reference loop is
    # unbounded (HttpReader.java:309-324); here it errors out loudly.
    page_limit: int = 100_000


def _request_headers(spec: HttpReadSpec) -> dict:
    h = dict(spec.headers)
    if spec.username is not None and spec.password is not None:
        import base64

        cred = base64.b64encode(f"{spec.username}:{spec.password}".encode()).decode()
        h["Authorization"] = f"Basic {cred}"
    if spec.token is not None:
        h[spec.token_header] = f"{spec.token_prefix or ''}{spec.token}"
    return h


def _fetch(spec: HttpReadSpec, extra_params: dict) -> str:
    """One HTTP request -> response body (urllib; raises on status >= 400,
    matching HttpReader.java:426-428)."""
    import urllib.parse
    import urllib.request

    params = {**spec.params, **extra_params}
    url, data = spec.url, None
    if spec.method.upper() == "GET":
        if params:
            sep = "&" if "?" in url else "?"
            url = url + sep + urllib.parse.urlencode(params)
    elif spec.method.upper() == "POST":
        data = json.dumps(params).encode()
    else:
        raise ValueError(f"httpreader: unsupported method {spec.method!r}")
    req = urllib.request.Request(url, data=data, headers=_request_headers(spec))
    if data is not None:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=spec.timeout) as resp:
        return resp.read().decode(resp.headers.get_content_charset() or "utf-8")


def _result_objects(body: str, result_key: str, strict: bool = False) -> list[dict]:
    """Response body -> list of record objects: resultKey path (plain key or
    dotted), array -> records, single object -> one record.

    ``strict`` distinguishes 'resultKey path ABSENT' (an error envelope —
    raise, ADVICE r4) from 'path present but empty array' (a legitimate
    short/empty page -> []). The executor fan-out uses strict: it has no
    short-page stop signal, so a silently-dropped page would be
    indistinguishable from success; the sequential probe stays lenient —
    a missing key there reads as a short page and stops the loop, the
    reference's own behavior."""
    data = json.loads(body)
    if result_key:
        for part in result_key.lstrip("$").lstrip(".").split("."):
            if not isinstance(data, dict) or part not in data:
                if strict:
                    raise ValueError(
                        f"httpreader: resultKey path {result_key!r} absent in "
                        f"response (failed at {part!r}) — error envelope?"
                    )
                return []
            data = data[part]
    if isinstance(data, list):
        return [o for o in data if isinstance(o, dict)]
    if isinstance(data, dict):
        return [data]
    return []


def _col_name(path: str) -> str:
    return re.sub(r"\W+", "_", path.lstrip("$").lstrip(".")).strip("_")


def _project(raw: DataFrame, columns: list[str]) -> DataFrame:
    """JSON-string rows -> string columns via get_json_object (JVM-side;
    reference emits StringColumn for every value, HttpReader.java:475-489)."""
    cols = [
        F.get_json_object("value", p if p.startswith("$") else f"$.{p}").alias(_col_name(p))
        for p in columns
    ]
    return raw.select(*cols)


def read_http(spark: SparkSession, spec: HttpReadSpec) -> DataFrame:
    """REST endpoint -> DataFrame of string columns.

    Executor-parallel when the page count is known (max_pages); otherwise
    the reference's sequential stop-on-short-page probe on the driver.
    Unpaged (page_size None): a single request.
    """
    if spec.max_pages is not None and spec.page_size is not None:
        # page fan-out on executors: fetch + flatten inside mapInPandas,
        # one output row per record (value = the record object's JSON)
        import pandas as pd

        idx_key, size_key, size, s = (
            spec.page_index_key,
            spec.page_size_key,
            spec.page_size,
            spec,
        )

        def fetch_pages(batches):
            for pdf in batches:
                for page in pdf["id"]:
                    body = _fetch(s, {idx_key: int(page), size_key: size})
                    objs = _result_objects(body, s.result_key, strict=True)
                    if objs:
                        yield pd.DataFrame({"value": [json.dumps(o) for o in objs]})

        pages = spark.range(spec.start_index, spec.start_index + spec.max_pages)
        raw = pages.repartition(min(spec.max_pages, spark.sparkContext.defaultParallelism)) \
            .mapInPandas(fetch_pages, "value string")
        if spec.columns and spec.columns != ["*"]:
            cols = spec.columns
        else:
            # one driver-side sample request only when the column list
            # must be discovered from the first record's keys
            cols = _resolve_columns(spec, _fetch(spec, {idx_key: spec.start_index, size_key: size}))
        return _project(raw, cols)

    rows: list[str] = []
    first_body: str | None = None
    if spec.page_size is None:
        first_body = _fetch(spec, {})
        rows = [json.dumps(o) for o in _result_objects(first_body, spec.result_key)]
    else:
        page = spec.start_index
        while True:
            body = _fetch(spec, {spec.page_index_key: page, spec.page_size_key: spec.page_size})
            first_body = first_body or body
            objs = _result_objects(body, spec.result_key)
            rows.extend(json.dumps(o) for o in objs)
            if len(objs) < spec.page_size:
                break
            page += 1
            if page - spec.start_index >= spec.page_limit:
                raise ValueError(
                    f"httpreader: sequential page probe exceeded page_limit="
                    f"{spec.page_limit} without a short page — the endpoint "
                    "may repeat pages forever; raise page_limit or pass "
                    "max_pages for the bounded executor-parallel path"
                )
    cols = _resolve_columns(spec, first_body or "{}")
    raw = spark.createDataFrame([(r,) for r in rows], "value string")
    return _project(raw, cols)


def _resolve_columns(spec: HttpReadSpec, sample_body: str) -> list[str]:
    """`*` / missing column list expands to the first record's keys
    (HttpReader.java:466-469); an empty response with no explicit columns
    is the same config error the reference raises."""
    if spec.columns and spec.columns != ["*"]:
        return spec.columns
    objs = _result_objects(sample_body, spec.result_key)
    if not objs:
        raise ValueError("httpreader: empty response and no explicit column list")
    return list(objs[0].keys())
