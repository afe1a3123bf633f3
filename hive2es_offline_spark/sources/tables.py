"""Table sources.

The reference reads exactly one source kind — a Hive table with an optional
WHERE string pushed into the scan (``Hive2ES.scala:40-41``).  Here the source
layer is a thin declarative wrapper over ``spark.read`` so Catalyst keeps
predicate pushdown / column pruning / partition pruning:

* ``read_table(spark, name, sf_dir)`` — parquet-backed named table (the test
  harness layout: ``{sf_dir}/{name}.parquet``).
* ``read_table(spark, "db.tbl")`` with no ``sf_dir`` — metastore table via
  ``spark.table`` (the production path; requires Hive support on the session).

Filters/columns are applied as DataFrame ops, NOT collected — at 100 TB the
WHERE string is the difference between scanning a partition and scanning the
lake, so it must stay inside the logical plan where partition pruning sees it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(
    spark: SparkSession,
    name: str,
    sf_dir: str | None = None,
    where: str | None = None,
    columns: list[str] | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Scan a table declaratively (reference O1+O2: scan + WHERE pushdown).

    ``fmt`` selects the file source (parquet/orc push filters down; json/csv
    only prune columns) — the reference reads Hive tables only; file-format
    breadth is an engine extension.
    """
    if sf_dir:
        # the harness events table stores TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects; read nanos as long and truncate to
        # micros (same truncation DuckDB applies, so oracle parity holds)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        path = os.path.join(sf_dir, f"{name}.{fmt}")
        reader = spark.read
        if fmt == "csv":
            reader = reader.option("header", "true").option("inferSchema", "true")
        df = reader.format(fmt).load(path)
        for f in df.schema.fields:
            if f.name == "ts" and f.dataType.simpleString() == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.table(name)
    if where:
        df = df.where(where)
    if columns:
        df = df.select(*columns)
    return df


def read_sf_dir(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All harness tables from one scale-factor directory."""
    return {t: read_table(spark, t, sf_dir) for t in TABLES}
