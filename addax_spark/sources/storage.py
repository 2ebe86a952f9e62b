"""File-storage sources with the reference's reader-config semantics.

Re-expresses the shared CSV/text engine of txtfilereader/ftpreader/s3reader
(lib/addax-storage/.../StorageReaderUtil.java:112-154 compression dispatch,
:202-259 commons-csv parse, :293-334 line->Record with nullFormat, :380-424
typed column extraction with index/value/format) and hdfsreader's format
matrix (plugin/reader/hdfsreader/.../HdfsConstant.java:35-44: TEXT CSV ORC
SEQ RC PARQUET) on Spark's built-in datasources:

- compression dispatch: built-in (extension-based codec inference)
- column pruning by index/name: select() — Catalyst pushes projection into
  the scan (ReadSchema), matching the reference's per-index extraction
- `column: [{value: X, type: T}]` constant columns: F.lit(X).cast(T)
- nullFormat (e.g. '\\N' -> null): spark.read nullValue option
- dateFormat: timestampFormat/dateFormat options
- dirty-record policy: see quarantine() below — PERMISSIVE parse +
  corrupt-record capture replaces TaskPluginCollector
  (core/.../statistics/plugin/task/StdoutPluginCollector.java)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class ColumnSpec:
    """One entry of the reference's `column` config: read a source field by
    index/name, or synthesize a constant (StorageReaderUtil.java:509-546)."""

    type: str
    index: int | None = None
    name: str | None = None
    value: object | None = None
    format: str | None = None  # date/timestamp pattern


@dataclass
class StorageReadSpec:
    path: str
    fmt: str = "csv"  # csv | text | json | parquet | orc
    delimiter: str = ","
    header: bool = False
    null_format: str | None = None
    encoding: str = "UTF-8"
    columns: list[ColumnSpec] = field(default_factory=list)
    # global datetime fallback chain (the reference's ColumnCast extraFormats,
    # core/.../element/ColumnCast.java:85-138): a date/timestamp column tries
    # its own `format` first, then each extra format, then Spark's default
    extra_formats: list[str] = field(default_factory=list)


def read_storage(spark: SparkSession, spec: StorageReadSpec) -> DataFrame:
    """Read per spec; column list applied as projection + constants + casts."""
    r = spark.read
    if spec.fmt == "csv":
        r = r.options(
            sep=spec.delimiter,
            header=str(spec.header).lower(),
            encoding=spec.encoding,
            mode="PERMISSIVE",
        )
        if spec.null_format is not None:
            r = r.option("nullValue", spec.null_format)
        df = r.csv(spec.path)
    elif spec.fmt == "text":
        df = spark.read.text(spec.path)
    elif spec.fmt == "json":
        df = spark.read.json(spec.path)
    elif spec.fmt == "parquet":
        df = spark.read.parquet(spec.path)
    elif spec.fmt == "orc":
        df = spark.read.orc(spec.path)
    else:
        raise ValueError(f"unsupported format {spec.fmt!r}")

    if not spec.columns:
        return df
    cols = []
    src = df.columns
    for i, c in enumerate(spec.columns):
        if c.value is not None:
            col = F.lit(c.value)
        elif c.index is not None:
            col = F.col(src[c.index])
        else:
            col = F.col(c.name)
        if c.type in ("date", "timestamp") and (c.format or spec.extra_formats):
            fmts = ([c.format] if c.format else []) + list(spec.extra_formats)
            col = parse_datetime(col, fmts)
            if c.type == "date":
                col = col.cast("date")
        else:
            col = col.cast(c.type)
        cols.append(col.alias(c.name or f"c{i}"))
    return df.select(*cols)


def parse_datetime(col, fmts: list[str]):
    """Fallback-chain datetime parse (ColumnCast.java:85-138 extraFormats):
    try each pattern in order, then Spark's default parser; ANSI-safe (a
    value no pattern accepts becomes null -> quarantine as a dirty record,
    not a runtime error). Patterns are Java SimpleDateFormat-compatible for
    the y/M/d/H/m/s subset the reference configs use."""
    c = col if not isinstance(col, str) else F.col(col)
    tries = [F.try_to_timestamp(c, F.lit(f)) for f in fmts]
    tries.append(F.try_to_timestamp(c))
    return F.coalesce(*tries)


# ----------------------------------------------------- dirty-record policy


def _try_cast(col: str, typ: str, fmt: str | list[str] | None = None):
    """try_cast, with format-aware date/timestamp parsing (ANSI-safe: a
    malformed value yields null instead of a runtime error). ``fmt`` may be
    a single pattern or a fallback chain (extraFormats)."""
    c = F.col(col)
    if typ in ("date", "timestamp") and fmt:
        fmts = [fmt] if isinstance(fmt, str) else list(fmt)
        t = parse_datetime(c, fmts)
        return t.cast("date") if typ == "date" else t
    return c.try_cast(typ)


def quarantine(
    df: DataFrame,
    casts: dict[str, str],
    with_reason: bool = False,
    formats: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (clean, dirty) under typed casts.

    The Spark-native dirty-record collector: the reference wraps each record
    cast in try/catch and routes failures to a TaskPluginCollector
    (transport/exchanger/TransformerExchanger.java:129-133;
    ErrorRecordChecker budgets at core/.../util/ErrorRecordChecker.java:
    49-105). Here try_cast marks failures as null-with-original-non-null;
    dirty rows keep their original values for the quarantine sink.

    with_reason=True adds an ``_error_reason`` column to the dirty side
    naming every failing (column, target-type, offending value) — the
    record + exception context the reference's StdoutPluginCollector logs
    per dirty row, persisted instead of printed."""
    formats = formats or {}
    clean = df
    dirty_pred = F.lit(False)
    for col, typ in casts.items():
        ok = _try_cast(col, typ, formats.get(col))
        dirty_pred = dirty_pred | (F.col(col).isNotNull() & ok.isNull())
    dirty = df.filter(dirty_pred)
    clean = df.filter(~dirty_pred)
    if with_reason:
        reasons = [
            F.when(
                F.col(col).isNotNull() & _try_cast(col, typ, formats.get(col)).isNull(),
                F.concat(
                    F.lit(f"{col} !~ {typ}: '"), F.col(col).cast("string"), F.lit("'")
                ),
            )
            for col, typ in casts.items()
        ]
        dirty = dirty.withColumn(
            "_error_reason", F.array_join(F.array_compact(F.array(*reasons)), "; ")
        )
    for col, typ in casts.items():
        clean = clean.withColumn(col, _try_cast(col, typ, formats.get(col)))
    return clean, dirty


def check_error_limit(
    n_dirty: int, n_total: int, max_records: int | None = None, max_pct: float | None = None
) -> None:
    """Fail the job when the dirty budget is exceeded; record limit takes
    priority over percentage, like the reference
    (ErrorRecordChecker.java:66-68)."""
    if max_records is not None and n_dirty > max_records:
        raise RuntimeError(
            f"dirty-record limit exceeded: {n_dirty} > {max_records} records"
        )
    if max_pct is not None and n_total > 0 and n_dirty / n_total > max_pct:
        raise RuntimeError(
            f"dirty-record ratio exceeded: {n_dirty / n_total:.4f} > {max_pct}"
        )
