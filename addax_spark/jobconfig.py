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

from .operators.transforms import Transform, chain
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
    else:
        raise ValueError(f"unsupported transformer {name!r} (dx_groovy is a "
                         "policy exclusion — use vectorized pandas UDFs)")
    return Transform(name, args)


# ------------------------------------------------------------------- readers


def _read(spark: SparkSession, jobspec: ComposedJob) -> DataFrame:
    name, p = jobspec.reader_name, jobspec.reader_param
    if name == "streamreader":
        return _stream_reader(spark, p)
    if name in STORAGE_READERS:
        return _storage_reader(spark, p, jobspec)
    if name in JDBC_READERS:
        conn = (p.get("connection") or [{}])[0]
        url = conn.get("jdbcUrl")
        url = url[0] if isinstance(url, list) else url
        r = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("user", p.get("username", ""))
            .option("password", p.get("password", ""))
        )
        if p.get("querySql"):
            q = p["querySql"]
            r = r.option("query", q[0] if isinstance(q, list) else q)
        else:
            tbl = conn.get("table")
            r = r.option("dbtable", tbl[0] if isinstance(tbl, list) else tbl)
        if p.get("splitPk"):
            r = r.option("partitionColumn", p["splitPk"])
        if p.get("fetchSize"):
            r = r.option("fetchsize", str(p["fetchSize"]))
        return r.load()
    raise ValueError(f"unsupported reader {name!r}")


def _stream_reader(spark: SparkSession, p: dict) -> DataFrame:
    n = int(p.get("sliceRecordCount", 0))
    df = spark.range(n).withColumnRenamed("id", "_row")
    cols = []
    for i, c in enumerate(p.get("column", [])):
        typ = c.get("type", "string")
        typ = {"long": "long", "double": "double", "date": "timestamp",
               "bool": "boolean", "bytes": "string", "string": "string"}.get(typ, typ)
        if "random" in c:
            lo, hi = (int(x) for x in str(c["random"]).split(","))
            col = (F.pmod(F.xxhash64(F.col("_row"), F.lit(i)), F.lit(hi - lo + 1)) + lo).cast(typ)
        else:
            col = F.lit(c.get("value")).cast(typ)
        cols.append(col.alias(f"col{i + 1}"))
    return df.select(*cols)


def _storage_reader(spark: SparkSession, p: dict, jobspec: ComposedJob) -> DataFrame:
    fmt = (p.get("fileType") or p.get("fileFormat") or "csv").lower()
    fmt = {"text": "text", "txt": "text", "csv": "csv", "orc": "orc",
           "parquet": "parquet", "json": "json"}.get(fmt, fmt)
    columns, casts, formats = [], {}, {}
    for i, c in enumerate(p.get("column", []) or []):
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
        # read as string; quarantine applies the typed cast with reasons
        columns.append(ColumnSpec(type="string", index=c.get("index", i), name=name))
        if typ != "string" and fmt in ("csv", "text", "json"):
            casts[name] = typ
            extra = p.get("extraFormats") or []  # ColumnCast fallback chain
            if c.get("format") or extra:
                formats[name] = ([c["format"]] if c.get("format") else []) + list(extra)
    spec = StorageReadSpec(
        path=p["path"] if isinstance(p.get("path"), str) else p["path"][0],
        fmt=fmt,
        delimiter=p.get("fieldDelimiter", ","),
        header=bool(p.get("skipHeader", p.get("header", False))),
        null_format=p.get("nullFormat"),
        encoding=p.get("encoding", "UTF-8"),
        columns=columns,
    )
    jobspec.casts, jobspec.formats = casts, formats
    return read_storage(spark, spec)


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


def _write(spark: SparkSession, df: DataFrame, jobspec: ComposedJob) -> int:
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

    if name in STORAGE_WRITERS or name == "icebergwriter":
        path = p.get("path") or p.get("table")
        mode = (p.get("writeMode") or "append").lower()
        pre = _render_sqls(p.get("preSql"), path)
        post = _render_sqls(p.get("postSql"), path)
        is_path = "/" in str(path)
        _run_lifecycle_sql(spark, pre, path if is_path else None)
        n = df.count()
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
        return n

    if name in JDBC_WRITERS:
        conn = (p.get("connection") or [{}])[0]
        url = conn.get("jdbcUrl")
        url = url[0] if isinstance(url, list) else url
        tbl = conn.get("table")
        tbl = tbl[0] if isinstance(tbl, list) else tbl
        n = df.count()
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
        (
            df.write.format("jdbc").mode(mode)
            .option("url", url).option("dbtable", tbl)
            .option("user", p.get("username", ""))
            .option("password", p.get("password", ""))
            .save()
        )
        return n

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
    jobspec = job_from_config(load_config(cfg))
    t0 = time.time()
    df = _read(spark, jobspec)
    n_read = df.count()

    n_dirty = 0
    if jobspec.casts:
        clean, dirty = quarantine(df, jobspec.casts, with_reason=True, formats=jobspec.formats)
        err_path = _errors_path(jobspec)
        if err_path:
            dirty.write.mode("overwrite").json(err_path)
            n_dirty = spark.read.json(err_path).count() if _dir_nonempty(err_path) else 0
        else:
            n_dirty = dirty.count()
        df = clean

    # transformer chain: columnIndex -> resolved column name
    resolved = [
        Transform(t.name, (df.columns[t.args[0]], *t.args[1:])) for t in jobspec.transforms
    ]
    df = chain(df, resolved)

    n_written = _write(spark, df, jobspec)
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
