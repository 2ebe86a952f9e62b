"""JDBC source/sink: the reference's 11 RDBMS reader plugins and their
writers collapse into Spark's partitioned JDBC datasource.

Reader mapping (lib/addax-rdbms/.../CommonRdbmsReader.java):
- table-mode (`column`+`table`+`where`, :237-278 one SQL per task) ->
  spark.read.jdbc(dbtable, predicates) / partitionColumn bounds
- querySql-mode -> option("query", ...)
- split strategies (ReaderSplitUtil.java:55-137 equal-width ranges;
  SingleTableSplitUtil.java:271-329 sampled skew-resistant split points) ->
  numPartitions/lowerBound/upperBound (Spark issues range predicates), or
  explicit `predicates` built by split_predicates() below for custom points
- fetchSize streaming (:255) -> option("fetchsize")

Writer mapping (CommonRdbmsWriter.java:399-470 buffered batches; upsert
templates WriterUtil.java:166-309) -> df.write.jdbc for insert;
MERGE/upsert belongs to the lakehouse layer (Iceberg MERGE INTO), not
driver-side SQL splicing.

No database is available in this container — functions build configs and
predicates (unit-testable); the spark.read.jdbc call itself is exercised
only when a URL is reachable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSpec:
    url: str
    table: str | None = None
    query: str | None = None
    user: str | None = None
    password: str | None = None
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 1
    fetch_size: int = 2048
    where: str | None = None


def split_predicates(
    column: str, points: list[int], where: str | None = None, nullable: bool = True
) -> list[str]:
    """Range predicates from explicit split points (the reference's sampled
    split-point strategy, SingleTableSplitUtil.java:271-329 + range->WHERE
    assembly :345-372), including the separate IS NULL slice (:117-125)."""
    preds = []
    w = f" AND ({where})" if where else ""
    for lo, hi in zip(points[:-1], points[1:]):
        preds.append(f"{column} >= {lo} AND {column} < {hi}{w}")
    preds.append(f"{column} >= {points[-1]}{w}")
    if nullable:
        preds.append(f"{column} IS NULL{w}")
    return preds


def equal_width_points(lo: int, hi: int, n: int) -> list[int]:
    """Equal-width BigInteger-style split (core/.../util/RangeSplitUtil.java:
    69-119): n ranges covering [lo, hi], remainder spread to the first ones."""
    if n <= 1 or hi <= lo:
        return [lo]
    width, rem = divmod(hi - lo, n)
    pts, cur = [lo], lo
    for i in range(n - 1):
        cur += width + (1 if i < rem else 0)
        pts.append(cur)
    return pts


def read_jdbc(spark: SparkSession, spec: JdbcSpec) -> DataFrame:
    r = (
        spark.read.format("jdbc")
        .option("url", spec.url)
        .option("fetchsize", str(spec.fetch_size))
    )
    if spec.user:
        r = r.option("user", spec.user).option("password", spec.password or "")
    if spec.query:
        r = r.option("query", spec.query)
    else:
        table = spec.table
        if spec.where:
            table = f"(SELECT * FROM {spec.table} WHERE {spec.where}) t"
        r = r.option("dbtable", table)
        if spec.partition_column is not None:
            r = (
                r.option("partitionColumn", spec.partition_column)
                .option("lowerBound", str(spec.lower_bound))
                .option("upperBound", str(spec.upper_bound))
                .option("numPartitions", str(spec.num_partitions))
            )
    return r.load()


def write_jdbc(df: DataFrame, spec: JdbcSpec, mode: str = "append", batch_size: int = 2048) -> None:
    (
        df.write.format("jdbc")
        .option("url", spec.url)
        .option("dbtable", spec.table)
        .option("user", spec.user or "")
        .option("password", spec.password or "")
        .option("batchsize", str(batch_size))
        .mode(mode)
        .save()
    )
