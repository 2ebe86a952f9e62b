"""Declarative job composer: the reference's JSON/YAML job-config surface.

Addax's "query language" is a job file — reader -> transformer chain ->
writer plus setting.speed / errorLimit (core/src/main/job/job.json:1-50 and
the 58 sibling samples; parsing at core/.../Engine.java:113-138, YAML at
core/.../util/ConfigParser.java:171-190). This module accepts that exact
shape and compiles it to ONE Spark pipeline:

    cfg = load_config("job.json")            # or .yaml, or a dict
    metrics = run_job(spark, cfg)

Mapping decisions (Spark-first, not a channel-machinery translation):

- reader.name: streamreader (synthetic columns; `random` ranges are made
  DETERMINISTIC via xxhash64 of the row id — a documented deviation, the
  reference uses an unseeded RNG), txtfile/ftp/s3/hdfs readers (shared
  storage engine, sources/storage.py), *jdbc* readers (spark.read jdbc —
  needs a driver + database, absent in the sandbox).
- Typed columns are read as STRINGS first, then split clean/dirty with
  sources.storage.quarantine (try_cast + reason capture) so a bad cell
  becomes a dirty RECORD (the reference's TaskPluginCollector route,
  StdoutPluginCollector.java) instead of an ANSI runtime error.
- transformer[]: the reference's {name, parameter:{columnIndex, paras}}
  entries compile to operators.transforms.chain on resolved column names.
- writer.name: streamwriter (console twin), txtfile/hdfs writers (csv /
  text / parquet / orc via one path), icebergwriter (sinks.table), *jdbc*
  writers (spark.write jdbc, same environment caveat).
- writer preSql/postSql run around the write with the reference's @table
  macro rendered (WriterUtil.java:104-134 renderPreOrPostSqls). Catalog
  targets execute via spark.sql; for path targets only the ubiquitous
  "truncate table @table" (mapped to clearing the output) and SELECT
  statements (validation probes) are meaningful — anything else raises.
- setting.errorLimit {record, percentage}: dirty rows are PERSISTED to
  <output>/_errors with _error_reason, then the budget is enforced with
  record-count priority (ErrorRecordChecker.java:66-68). Budget breach
  raises AFTER the dirty rows are persisted — same as the reference,
  which checks post-run (ErrorRecordChecker.java:49-105).
- setting.speed.channel maps to output parallelism (repartition before
  write); byte/record throttles have no Spark batch equivalent (the
  engine is not rate-limited) and are accepted-but-ignored.
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.transforms import Transform, chain, get_transformer
from .sinks.table import write_table
from .sources.storage import (
    ColumnSpec,
    StorageReadSpec,
    check_error_limit,
    quarantine,
    read_storage,
)

STORAGE_READERS = {"txtfilereader", "ftpreader", "s3reader", "hdfsreader"}
STORAGE_WRITERS = {"txtfilewriter", "ftpwriter", "s3writer", "hdfswriter"}
JDBC_READERS = {
    "rdbmsreader", "mysqlreader", "postgresqlreader", "oraclereader",
    "sqlserverreader", "clickhousereader", "databendreader", "sqlitereader",
}
JDBC_WRITERS = {
    "rdbmswriter", "mysqlwriter", "postgresqlwriter", "oraclewriter",
    "sqlserverwriter", "clickhousewriter", "databendwriter", "sqlitewriter",
}


def load_config(source: str | dict) -> dict:
    """Job dict from a JSON/YAML path or an already-parsed dict."""
    if isinstance(source, dict):
        return source
    with open(source) as f:
        text = f.read()
    if source.endswith((".yaml", ".yml")):
        import yaml

        return yaml.safe_load(text)
    return json.loads(text)


@dataclass
class ComposedJob:
    reader_name: str
    reader_param: dict
    transforms: list[Transform]
    writer_name: str
    writer_param: dict
    error_limit_records: int | None = None
    error_limit_pct: float | None = None
    channel: int | None = None
    casts: dict[str, str] = field(default_factory=dict)
    formats: dict[str, str] = field(default_factory=dict)


def job_from_config(cfg: dict) -> ComposedJob:
    job = cfg["job"]
    content = job["content"]
    if isinstance(content, list):  # older configs wrap content in a list
        content = content[0]
    setting = job.get("setting", {})
    el = setting.get("errorLimit", {}) or {}
    speed = setting.get("speed", {}) or {}
    reader, writer = content["reader"], content["writer"]
    transforms = [_compile_transform(t) for t in content.get("transformer", [])]
    return ComposedJob(
        reader_name=reader["name"],
        reader_param=reader.get("parameter", {}),
        transforms=transforms,
        writer_name=writer["name"],
        writer_param=writer.get("parameter", {}),
        error_limit_records=el.get("record"),
        error_limit_pct=el.get("percentage"),
        channel=speed.get("channel"),
    )


def _compile_transform(t: dict) -> Transform:
    """Reference transformer entry {name, parameter:{columnIndex, paras}} ->
    a Transform whose column is resolved by INDEX at run time (marker arg)."""
    name = t["name"]
    p = t.get("parameter", {})
    idx = p.get("columnIndex")
    paras = [str(x) for x in p.get("paras", [])]
    if name == "dx_substr":
        args = (idx, int(paras[0]), int(paras[1]))
    elif name == "dx_pad":
        args = (idx, "l" if paras[0].lower().startswith("l") else "r", int(paras[1]), paras[2])
    elif name == "dx_replace":
        args = (idx, int(paras[0]), int(paras[1]), paras[2])
    elif name == "dx_map":
        args = (idx, paras[0], paras[1])
    elif name == "dx_filter":
        args = (idx, paras[0], paras[1])
    elif name == "dx_groovy":
        raise ValueError("dx_groovy is a policy exclusion — register a "
                         "vectorized transform via register_transformer() "
                         "and reference it by name instead")
    else:
        # registered custom transformer (TransformerRegistry.java:45-118
        # analog): paras pass through verbatim. Fail fast at config-compile
        # time — register_transformer() must run BEFORE job_from_config
        # (chain() re-resolves by name at execution anyway)
        get_transformer(name)
        args = (idx, *paras)
    return Transform(name, args)


# ------------------------------------------------------------------- readers


def _read(spark: SparkSession, jobspec: ComposedJob) -> DataFrame:
    name, p = jobspec.reader_name, jobspec.reader_param
    if name == "streamreader":
        return _stream_reader(spark, p)
    if name == "datareader":
        return _data_reader(spark, p)
    if name in STORAGE_READERS:
        return _storage_reader(spark, p, jobspec)
    if name == "httpreader":
        return _http_reader(spark, p)
    if name in JDBC_READERS:
        conn = p.get("connection") or [{}]
        conn = conn[0] if isinstance(conn, list) else conn
        url = conn.get("jdbcUrl")
        url = url[0] if isinstance(url, list) else url
        r = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("user", p.get("username", ""))
            .option("password", p.get("password", ""))
        )
        if p.get("driver"):  # reference optional `driver` key (rdbmsreader)
            r = r.option("driver", p["driver"])
        if p.get("querySql"):
            if p.get("splitPk"):
                raise ValueError(
                    "splitPk with querySql is a config error: the reference "
                    "splits table-mode reads only (ReaderSplitUtil.java)"
                )
            q = p["querySql"]
            r = r.option("query", q[0] if isinstance(q, list) else q)
        else:
            tbl = conn.get("table")
            tbl = tbl[0] if isinstance(tbl, list) else tbl
            r = r.option("dbtable", tbl)
            if p.get("splitPk"):
                # reference auto-bounds: SingleTableSplitUtil.java:271-329
                # queries MIN/MAX of the split pk, then tiles equal-width
                # ranges; Spark needs the same bounds for partitionColumn.
                # One 1-row bounds query, numPartitions = channel setting.
                pk = p["splitPk"]
                bq = (
                    spark.read.format("jdbc")
                    .option("url", url)
                    .option("user", p.get("username", ""))
                    .option("password", p.get("password", ""))
                    .option("query", f"SELECT MIN({pk}) AS LO, MAX({pk}) AS HI FROM {tbl}")
                )
                if p.get("driver"):
                    bq = bq.option("driver", p["driver"])
                lo, hi = bq.load().first()
                if lo is None:
                    raise ValueError(f"splitPk {pk!r}: table {tbl!r} is empty "
                                     "or the pk is all-NULL — nothing to split")
                r = (
                    r.option("partitionColumn", pk)
                    .option("lowerBound", str(lo))
                    .option("upperBound", str(hi))
                    .option("numPartitions", str(jobspec.channel or 4))
                )
        if p.get("fetchSize"):
            r = r.option("fetchsize", str(p["fetchSize"]))
        return r.load()
    raise ValueError(f"unsupported reader {name!r}")


# dateIncrement unit table (StreamReader.java:571-583; validation and
# 1-char normalization at :226-249, validUnits at :88). Reference quirk kept:
# units normalize to their FIRST char, so "month" becomes 'm' == minute.
_INCR_UNITS = {"d": "DAY", "M": "MONTH", "y": "YEAR", "w": "WEEK",
               "h": "HOUR", "m": "MINUTE", "s": "SECOND"}
_DEFAULT_DATE_FORMAT = "yyyy-MM-dd HH:mm:ss"  # core/.../base/Constant.java:28


def _http_reader(spark: SparkSession, p: dict) -> DataFrame:
    """httpreader config twin (HttpKey.java key names: connection.url,
    reqParams, headers, username/password/token, resultKey, column,
    isPage/pageParams{pageSize,pageIndex}{key,value}). Adds `maxPages` —
    not in the reference — to unlock the executor-parallel page fan-out
    (sources/http.py); without it, paging probes sequentially exactly like
    HttpReader.java:309-324."""
    from .sources.http import HttpReadSpec, read_http

    conn = p.get("connection") or {}
    if isinstance(conn, list):
        conn = conn[0] if conn else {}
    url = conn.get("url") or p.get("url")
    if not url:
        raise ValueError("httpreader: connection.url is required")
    page_params = p.get("pageParams") or {}
    def _pp(key, dflt_key, dflt_val):
        c = page_params.get(key) or {}
        return c.get("key", dflt_key), int(c.get("value", dflt_val))

    size_key, size_val = _pp("pageSize", "pageSize", 20)
    idx_key, idx_val = _pp("pageIndex", "pageIndex", 1)
    spec = HttpReadSpec(
        url=url,
        method=p.get("method", "GET"),
        params=p.get("reqParams") or {},
        headers=p.get("headers") or {},
        username=p.get("username"),
        password=p.get("password"),
        token=p.get("token"),
        token_header=p.get("tokenHeader", "Authorization"),
        token_prefix=p.get("tokenPrefix", "Bearer "),
        result_key=p.get("resultKey", ""),
        columns=p.get("column"),
        timeout=int(p.get("timeout", 60)),
        page_size=size_val if p.get("isPage") else None,
        page_index_key=idx_key,
        page_size_key=size_key,
        start_index=idx_val,
        max_pages=int(p["maxPages"]) if p.get("maxPages") is not None else None,
    )
    return read_http(spark, spec)


def _incr_column(c: dict, typ: str):
    """streamreader `incr` column (StreamReader.java:476-513 long/date paths,
    defaults applied by handleIncrFunction at :203-258): row i of the slice
    gets start + i*step (long), or start advanced i*step units (date).

    Deviation noted: the reference steps dates one increment per record
    (DateUtils.addMonths repeatedly), we compute timestampadd(unit, i*step)
    — identical except Java's end-of-month clamping for month/year steps
    starting on day 29-31, where repeated stepping sticks to the clamped day.
    """
    spec = str(c["incr"])
    fields = [s.strip() for s in spec.split(",")]
    if typ == "long":
        start = int(fields[0])
        step = int(fields[1]) if len(fields) > 1 else 1
        return (F.lit(start) + F.col("_row") * F.lit(step)).cast("long")
    if typ in ("date", "timestamp"):
        fmt = c.get("dateFormat", _DEFAULT_DATE_FORMAT)
        step = int(fields[1]) if len(fields) > 1 else 1
        if len(fields) <= 2:
            unit = "d"
        else:
            # an empty third field ("2024-01-01,1,") folds into the same
            # error as an unknown unit — not an IndexError
            unit = fields[2][0] if fields[2] else ""
        if unit not in _INCR_UNITS:
            raise ValueError(f"streamreader incr: invalid date unit {fields[2]!r}")
        start = F.to_timestamp(F.lit(fields[0]), fmt)
        return F.timestamp_add(_INCR_UNITS[unit], (F.col("_row") * step).cast("int"), start)
    raise ValueError(
        f"streamreader incr supports long/date columns only, got type {typ!r} "
        "(StreamReader.java:251-256 NOT_SUPPORT_TYPE)"
    )


# ----------------------------------------------------------- datareader rules
# The reference's datareader (plugin/reader/datareader/.../DataReader.java:
# 419-560) extends streamreader's constant/random/incr with faker-style rules
# (address/bank/company/email/name/phone/uuid/lat/lng/...), drawn from an
# unseeded RNG over bundled word lists. Here every rule is a DETERMINISTIC
# JVM column expression seeded by xxhash64(row, column-index) over small
# original pools — documented deviation (reproducible runs; the pools are
# this engine's own, not the reference's resource lists).

_POOLS = {
    "first": ["Alex", "Sam", "Jordan", "Taylor", "Morgan", "Casey", "Riley",
              "Quinn", "Avery", "Dana", "Lee", "Jamie", "Robin", "Drew"],
    "last": ["Smith", "Johnson", "Lee", "Brown", "Garcia", "Miller", "Davis",
             "Clark", "Walker", "Hall", "Young", "King", "Wright", "Scott"],
    "street": ["Maple", "Oak", "Cedar", "Elm", "Pine", "Birch", "Walnut",
               "Willow", "Aspen", "Spruce"],
    "city": ["Springfield", "Riverton", "Lakeview", "Hillcrest", "Fairview",
             "Georgetown", "Clinton", "Greenville", "Bristol", "Salem"],
    "company_w": ["Acme", "Globex", "Initech", "Umbra", "Vertex", "Nimbus",
                  "Quantum", "Stellar", "Apex", "Orchid"],
    "company_s": ["Corp", "LLC", "Ltd", "Group", "Labs", "Industries",
                  "Systems", "Holdings"],
    "domain": ["example.com", "example.org", "example.net", "mail.example",
               "post.example"],
    "job": ["Engineer", "Analyst", "Designer", "Manager", "Technician",
            "Accountant", "Teacher", "Chemist", "Editor", "Architect"],
    "bank": ["First National Bank", "Riverside Savings", "Summit Trust",
             "Harbor Credit Union", "Meridian Bank"],
}


def _rule_hash(i: int, *extra):
    return F.xxhash64(F.col("_row"), F.lit(i), *[F.lit(x) for x in extra])


def _pool_pick(pool: str, i: int, seed: int = 0):
    vals = _POOLS[pool]
    idx = F.pmod(_rule_hash(i, pool, seed), F.lit(len(vals))).cast("int")
    return F.element_at(F.array(*[F.lit(v) for v in vals]), idx + 1)


def _digits(i: int, n: int, seed: int = 0):
    """n deterministic decimal digits as a string (leading zeros kept)."""
    parts = [
        F.lpad(F.pmod(_rule_hash(i, "dig", seed, k), F.lit(1_000_000_000)).cast("string"), 9, "0")
        for k in range(-(-n // 9))
    ]
    return F.substring(F.concat(*parts), 1, n)


def _rule_column(rule: str, i: int):
    """One faker-rule column (DataReader.java:539-560 buildOtherColumn)."""
    name = F.concat_ws(" ", _pool_pick("first", i), _pool_pick("last", i, 1))
    if rule == "name":
        return name
    if rule == "address":
        return F.concat(
            (F.pmod(_rule_hash(i, "no"), F.lit(9999)) + 1).cast("string"),
            F.lit(" "), _pool_pick("street", i), F.lit(" St, "), _pool_pick("city", i),
        )
    if rule == "company":
        return F.concat_ws(" ", _pool_pick("company_w", i), _pool_pick("company_s", i))
    if rule == "email":
        return F.concat(F.lower(F.regexp_replace(name, " ", ".")),
                        F.pmod(_rule_hash(i, "em"), F.lit(100)).cast("string"),
                        F.lit("@"), _pool_pick("domain", i))
    if rule == "phone":
        return F.concat(F.lit("1"), _digits(i, 10))
    if rule == "uuid":
        h = F.md5(_rule_hash(i, "uuid").cast("string"))
        return F.concat_ws("-", F.substring(h, 1, 8), F.substring(h, 9, 4),
                           F.substring(h, 13, 4), F.substring(h, 17, 4), F.substring(h, 21, 12))
    if rule == "idCard":
        return _digits(i, 18)
    if rule in ("debitCard", "creditCard"):
        return _digits(i, 16)
    if rule == "bank":
        return _pool_pick("bank", i)
    if rule == "job":
        return _pool_pick("job", i)
    if rule == "stockCode":
        return _digits(i, 6)
    if rule == "stockAccount":
        return _digits(i, 10)
    if rule in ("lat", "latitude"):
        return (F.pmod(_rule_hash(i, "lat"), F.lit(180_000_000)) / 1e6 - 90.0).cast("double")
    if rule in ("lng", "longitude"):
        return (F.pmod(_rule_hash(i, "lng"), F.lit(360_000_000)) / 1e6 - 180.0).cast("double")
    if rule == "zipCode":
        return (F.pmod(_rule_hash(i, "zip"), F.lit(600_000)) + 100_000).cast("long")
    raise ValueError(f"datareader: unsupported rule {rule!r}")


def _data_reader(spark: SparkSession, p: dict) -> DataFrame:
    """datareader twin: rule-dispatched synthetic columns
    (DataReader.java:419-431: constant | random | incr | <faker rule>)."""
    n = int(p.get("sliceRecordCount", 0))
    if n < 1:
        raise ValueError("sliceRecordCount is required and must be >= 1")
    cols_cfg = p.get("column") or []
    if not cols_cfg:
        raise ValueError("column is required and must NOT be empty")
    df = spark.range(n).withColumnRenamed("id", "_row")
    cols = []
    for i, c in enumerate(cols_cfg):
        rule = str(c.get("rule", "constant"))
        typ = c.get("type", "string")
        spark_typ = {"long": "long", "double": "double", "date": "timestamp",
                     "bool": "boolean", "bytes": "string", "string": "string"}.get(typ, typ)
        if rule == "constant":
            v = c.get("value")
            if v is None:
                raise ValueError(f"datareader column {i}: constant rule needs a value")
            col = F.lit(None if str(v).lower() == "null" else v).cast(spark_typ)
        elif rule == "random":
            spec = c.get("random", c.get("value"))
            if spec is None:
                raise ValueError(
                    f"datareader column {i}: random rule needs a 'lo,hi' range "
                    "(random or value key)"
                )
            try:
                lo, hi = (int(x) for x in str(spec).split(",")[:2])
            except ValueError:
                raise ValueError(
                    f"datareader column {i}: random range must be 'lo,hi' integers, "
                    f"got {spec!r}"
                ) from None
            if hi < lo:
                raise ValueError(
                    f"datareader column {i}: random range hi < lo ({spec!r})"
                )
            col = (F.pmod(F.xxhash64(F.col("_row"), F.lit(i)), F.lit(hi - lo + 1)) + lo).cast(spark_typ)
        elif rule == "incr":
            col = _incr_column({"incr": c.get("incr", c.get("value")),
                                "dateFormat": c.get("dateFormat", _DEFAULT_DATE_FORMAT)}, typ)
        else:
            # honor the declared type: zipCode is naturally long, lat/lng
            # double, everything else string — cast to the configured type
            col = _rule_column(rule, i).cast(spark_typ)
        cols.append(col.alias(c.get("name") or f"col{i + 1}"))
    return df.select(*cols)


def _stream_reader(spark: SparkSession, p: dict) -> DataFrame:
    n = int(p.get("sliceRecordCount", 0))
    df = spark.range(n).withColumnRenamed("id", "_row")
    cols = []
    for i, c in enumerate(p.get("column", [])):
        typ = c.get("type", "string")
        spark_typ = {"long": "long", "double": "double", "date": "timestamp",
                     "bool": "boolean", "bytes": "string", "string": "string"}.get(typ, typ)
        # precedence per parseMixUpFunctions (StreamReader.java:175-201):
        # an explicit `value` wins over random/incr; a column with NONE of
        # value/random/incr is a config error (getNecessaryValue :180-182)
        if "value" in c:
            # the string "null" means a null column (buildOneColumn :440-442)
            v = None if str(c["value"]).lower() == "null" else c["value"]
            col = F.lit(v).cast(spark_typ)
        elif "random" in c:
            lo, hi = (int(x) for x in str(c["random"]).split(",")[:2])
            col = (F.pmod(F.xxhash64(F.col("_row"), F.lit(i)), F.lit(hi - lo + 1)) + lo).cast(spark_typ)
        elif "incr" in c:
            col = _incr_column(c, typ)
        else:
            raise ValueError(
                f"streamreader column {i} needs one of value/random/incr "
                f"(got keys {sorted(c)}); refusing to emit nulls silently"
            )
        cols.append(col.alias(f"col{i + 1}"))
    return df.select(*cols)


def _storage_reader(spark: SparkSession, p: dict, jobspec: ComposedJob) -> DataFrame:
    fmt = (p.get("fileType") or p.get("fileFormat") or "csv").lower()
    fmt = {"text": "text", "txt": "text", "csv": "csv", "orc": "orc",
           "parquet": "parquet", "json": "json"}.get(fmt, fmt)
    path = p["path"] if isinstance(p.get("path"), str) else p["path"][0]
    raw_cols = p.get("column", []) or []
    # Text-family formats read raw strings and route typed casts through the
    # quarantine pass (dirty-record capture); parquet/orc carry NATIVE types —
    # cast directly in the projection (no cell can be "malformed" in a typed
    # columnar file), never via a string round-trip.
    textual = fmt in ("csv", "text", "json")

    # jsonfilereader JSONPath projection (plugin/reader/jsonfilereader
    # plugin_job_template.json: column[].index = "$.a.b[0]"; missing leafs
    # null via DEFAULT_PATH_LEAF_TO_NULL, JsonReader.java:219-222)
    if fmt == "json" and any(
        isinstance(c, dict) and isinstance(c.get("index"), str)
        and str(c["index"]).startswith("$") for c in raw_cols
    ):
        return _jsonpath_reader(spark, path, raw_cols, jobspec)

    columns, casts, formats = [], {}, {}
    for i, c in enumerate(raw_cols):
        if isinstance(c, str):  # "*" or bare name
            if c == "*":
                continue
            columns.append(ColumnSpec(type="string", name=c))
            continue
        name = c.get("name") or f"col{i + 1}"
        if "value" in c:
            columns.append(ColumnSpec(type=c.get("type", "string"), value=c["value"], name=name))
            continue
        typ = c.get("type", "string").lower()
        typ = {"long": "long", "double": "double", "bool": "boolean",
               "date": "date", "timestamp": "timestamp", "string": "string",
               "bytes": "string"}.get(typ, typ)
        if textual:
            # read as string; quarantine applies the typed cast with reasons
            columns.append(ColumnSpec(type="string", index=c.get("index", i), name=name))
            if typ != "string":
                casts[name] = typ
                extra = p.get("extraFormats") or []  # ColumnCast fallback chain
                if c.get("format") or extra:
                    formats[name] = ([c["format"]] if c.get("format") else []) + list(extra)
        else:
            columns.append(ColumnSpec(type=typ, index=c.get("index", i), name=name,
                                      format=c.get("format")))
    spec = StorageReadSpec(
        path=path,
        fmt=fmt,
        delimiter=p.get("fieldDelimiter", ","),
        header=bool(p.get("skipHeader", p.get("header", False))),
        null_format=p.get("nullFormat"),
        encoding=p.get("encoding", "UTF-8"),
        columns=columns,
    )
    jobspec.casts, jobspec.formats = casts, formats
    return read_storage(spark, spec)


def _jsonpath_reader(spark: SparkSession, path: str, raw_cols: list, jobspec: ComposedJob) -> DataFrame:
    """JSONPath-projected JSON-Lines read: one get_json_object per column
    (JVM-side, no Python crossing); constants via F.lit. Extracted values are
    strings — typed casts go through quarantine exactly like the csv path."""
    cols, casts, formats = [], {}, {}
    for i, c in enumerate(raw_cols):
        name = c.get("name") or f"col{i + 1}"
        typ = c.get("type", "string").lower()
        typ = {"long": "long", "double": "double", "bool": "boolean",
               "date": "date", "timestamp": "timestamp", "string": "string",
               "bytes": "string"}.get(typ, typ)
        if "value" in c and "index" in c:
            raise ValueError(f"json column {i}: both index and value set "
                             "(JsonReader.java:150-153)")
        if "value" in c:
            cols.append(F.lit(c["value"]).cast(typ).alias(name))
            continue
        if "index" not in c:
            raise ValueError(f"json column {i}: either index or value is "
                             "required (JsonReader.java:145-148)")
        if not str(c["index"]).startswith("$"):
            # a positional index mixed into a JSONPath config would compile
            # to get_json_object(value, '0') == null-for-every-row
            raise ValueError(
                f"json column {i}: index {c['index']!r} is not a JSONPath "
                "('$...'); positional and JSONPath columns cannot be mixed"
            )
        cols.append(F.get_json_object(F.col("value"), str(c["index"])).alias(name))
        if typ != "string":
            casts[name] = typ
            if c.get("format"):
                formats[name] = [c["format"]]
    jobspec.casts, jobspec.formats = casts, formats
    return spark.read.text(path).select(*cols)


# ------------------------------------------------------------------- writers


def _render_sqls(sqls, table: str) -> list[str]:
    if not sqls:
        return []
    if isinstance(sqls, str):
        sqls = [sqls]
    return [s.replace("@table", table) for s in sqls if s and s.strip()]


def _run_lifecycle_sql(spark: SparkSession, stmts: list[str], path_target: str | None):
    """preSql/postSql twin: catalog statements via spark.sql; for path
    targets, 'truncate table <path>' clears the output dir and SELECTs run
    as validation probes."""
    for s in stmts:
        m = re.match(r"\s*truncate\s+table\s+(\S+)\s*$", s, re.IGNORECASE)
        if m and path_target is not None:
            _clear_dir(path_target)
            continue
        spark.sql(s).collect()


def _clear_dir(path: str):
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def _is_path_target(name: str, target: str) -> bool:
    """Storage writers always target paths; icebergwriter targets a catalog
    table unless the value is visibly a filesystem location. (A bare relative
    segment like 'out' names a catalog table — use './out' for a path.)"""
    if name in STORAGE_WRITERS:
        return True
    t = str(target)
    return ("/" in t or "\\" in t
            or t.startswith((".", "~", "file:", "s3:", "s3a:", "hdfs:", "oss:")))


def _write(spark: SparkSession, df: DataFrame, jobspec: ComposedJob) -> int:
    """Dispatch the writer and run ONE action; rows_written comes from a
    CollectMetrics observation on that same action (the reference gathers its
    Communication counters during its single pass, not by re-running the
    pipeline)."""
    from pyspark.sql import Observation

    name, p = jobspec.writer_name, jobspec.writer_param
    out_cols = p.get("column")
    if out_cols and out_cols != ["*"]:
        df = df.select(*[c for c in out_cols if c != "*"])
    if jobspec.channel and jobspec.channel > 0:
        df = df.repartition(jobspec.channel)

    if name == "streamwriter":
        n = df.count()
        if p.get("print"):
            df.show(n=min(n, 20), truncate=False)
        return n

    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("n"))

    if name in STORAGE_WRITERS or name == "icebergwriter":
        path = p.get("path") or p.get("table")
        mode = (p.get("writeMode") or "append").lower()
        pre = _render_sqls(p.get("preSql"), path)
        post = _render_sqls(p.get("postSql"), path)
        is_path = _is_path_target(name, path)
        if mode == "nonconflict":
            # reference nonConflict: refuse when the target already has data
            non_empty = (
                _dir_nonempty(path)
                if is_path
                else spark.catalog.tableExists(path) and spark.table(path).limit(1).count() > 0
            )
            if non_empty:
                raise RuntimeError(f"writeMode=nonConflict: target {path!r} is not empty")
        _run_lifecycle_sql(spark, pre, path if is_path else None)
        if name == "icebergwriter" and not is_path:
            write_table(df, path, {"truncate": "truncate", "append": "append",
                                   "overwrite": "overwrite_partitions"}.get(mode, "append"))
        else:
            fmt = (p.get("fileType") or p.get("fileFormat") or "csv").lower()
            w = df.write.mode("overwrite" if mode in ("truncate", "overwrite") else "append")
            if p.get("compress"):
                w = w.option("compression", p["compress"])
            if fmt == "parquet":
                w.parquet(path)
            elif fmt == "orc":
                w.orc(path)
            elif fmt in ("csv", "text", "txt"):
                w.option("sep", p.get("fieldDelimiter", ",")).option(
                    "header", str(bool(p.get("header", False))).lower()
                ).csv(path)
            else:
                raise ValueError(f"unsupported writer format {fmt!r}")
        _run_lifecycle_sql(spark, post, path if is_path else None)
        return int(obs.get["n"])

    if name in JDBC_WRITERS:
        if p.get("preSql") or p.get("postSql"):
            # the reference runs these against the target DB per task
            # (WriterUtil.java:104-134); without a database in reach we must
            # not silently drop a statement like "truncate table @table"
            raise ValueError(
                "preSql/postSql on a jdbc sink needs a live database "
                "connection; storage/iceberg writers run them via spark.sql — "
                "refusing to silently drop lifecycle SQL"
            )
        conn = p.get("connection") or [{}]
        conn = conn[0] if isinstance(conn, list) else conn
        url = conn.get("jdbcUrl")
        url = url[0] if isinstance(url, list) else url
        tbl = conn.get("table")
        tbl = tbl[0] if isinstance(tbl, list) else tbl
        wm = (p.get("writeMode") or "insert").lower()
        if wm in ("update", "replace"):
            # Spark's jdbc writer has no keyed upsert; the table-sink verbs
            # (sinks.table.upsert / sinks.table.replace) carry these
            # semantics — point migrated jobs there rather than silently
            # truncating the target
            raise ValueError(
                f"writeMode={wm} on a jdbc sink needs dialect SQL the Spark "
                "jdbc writer lacks; use the table sink (icebergwriter) with "
                "sinks.table.upsert/replace"
            )
        mode = {"insert": "append", "append": "append", "truncate": "overwrite"}.get(wm, "append")
        w = (
            df.write.format("jdbc").mode(mode)
            .option("url", url).option("dbtable", tbl)
            .option("user", p.get("username", ""))
            .option("password", p.get("password", ""))
        )
        if p.get("driver"):
            w = w.option("driver", p["driver"])
        w.save()
        return int(obs.get["n"])

    raise ValueError(f"unsupported writer {name!r}")


# ----------------------------------------------------------------- execution


def pre_check(spark: SparkSession, cfg: str | dict) -> dict[str, Any]:
    """Dry-run validation — the reference's preCheck path
    (JobContainer.java:191-269 + PreCheckTask.java): verify the reader
    resolves (connectivity/permissions/schema), the transformer chain
    compiles against the resolved columns, and the writer config is
    dispatchable — WITHOUT moving data. Spark mapping per SURVEY §3.3:
    schema assert + explain on a LIMIT 0 plan."""
    jobspec = job_from_config(load_config(cfg))
    df = _read(spark, jobspec)
    probe = df.limit(0)
    if jobspec.casts:
        probe, _ = quarantine(probe, jobspec.casts, formats=jobspec.formats)
    resolved = [
        Transform(t.name, (probe.columns[t.args[0]], *t.args[1:])) for t in jobspec.transforms
    ]
    probe = chain(probe, resolved)
    probe.collect()  # executes the empty plan: resolution + codegen checked
    wname = jobspec.writer_name
    if not (
        wname == "streamwriter" or wname in STORAGE_WRITERS
        or wname in JDBC_WRITERS or wname == "icebergwriter"
    ):
        raise ValueError(f"unsupported writer {wname!r}")
    return {
        "ok": True,
        "columns": probe.columns,
        "schema": probe.schema.simpleString(),
        "dirty_cast_columns": sorted(jobspec.casts),
        "plan": probe._jdf.queryExecution().simpleString(),
    }


def run_job(spark: SparkSession, cfg: str | dict) -> dict[str, Any]:
    """Load + execute a reference-shaped job config; returns metrics
    (the reference's end-of-job Communication report: read/write/dirty
    counts + wall)."""
    from pyspark.sql import Observation

    jobspec = job_from_config(load_config(cfg))
    t0 = time.time()
    df = _read(spark, jobspec)
    # rows_read via CollectMetrics on the pipeline's own action(s) — never a
    # separate count() pass (at 100 TB an extra count re-scans the source).
    # The quarantine/transform filters sit ABOVE this node, so whichever
    # action runs first observes the full read cardinality.
    obs_read = Observation()
    df = df.observe(obs_read, F.count(F.lit(1)).alias("n"))

    n_dirty = 0
    if jobspec.casts:
        clean, dirty = quarantine(df, jobspec.casts, with_reason=True, formats=jobspec.formats)
        obs_dirty = Observation()
        dirty = dirty.observe(obs_dirty, F.count(F.lit(1)).alias("n"))
        err_path = _errors_path(jobspec)
        if err_path:
            dirty.write.mode("overwrite").json(err_path)
        else:
            dirty.count()
        n_dirty = int(obs_dirty.get["n"])
        df = clean

    # transformer chain: columnIndex -> resolved column name
    resolved = [
        Transform(t.name, (df.columns[t.args[0]], *t.args[1:])) for t in jobspec.transforms
    ]
    df = chain(df, resolved)

    n_written = _write(spark, df, jobspec)
    n_read = int(obs_read.get["n"])
    # budget enforced AFTER dirty rows are persisted (reference checks
    # post-run, ErrorRecordChecker.java:49-105; record limit has priority)
    check_error_limit(
        n_dirty, n_read, max_records=jobspec.error_limit_records,
        max_pct=jobspec.error_limit_pct,
    )
    return {
        "rows_read": n_read,
        "rows_written": n_written,
        "dirty_records": n_dirty,
        "errors_path": _errors_path(jobspec),
        "wall_s": time.time() - t0,
    }


def _errors_path(jobspec: ComposedJob) -> str | None:
    # SIBLING of the output dir — a truncate-mode write overwrites the
    # output path itself, which must not take the dirty-record lineage with it
    p = jobspec.writer_param.get("path")
    if p and "/" in str(p):
        return f"{str(p).rstrip('/')}_errors"
    return None


def _dir_nonempty(path: str) -> bool:
    import glob
    import os

    return os.path.isdir(path) and any(
        not f.startswith("_") and not f.startswith(".")
        for f in (os.path.basename(x) for x in glob.glob(f"{path}/*"))
    )
