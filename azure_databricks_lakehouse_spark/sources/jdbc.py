"""JDBC source/sink (S12 tail: the reference's "databases" ingestion,
``README.md:20`` — Bronze pulls from operational databases alongside
files and streams).

Thin wrappers over Spark's built-in JDBC relation provider — declared via
options so Catalyst keeps its JDBC superpowers:

- **Predicate pushdown**: filters on the DataFrame compile into the
  remote ``WHERE`` clause (``pushDownPredicate``, on by default) — the
  database scans, Spark doesn't.
- **Column pruning**: only selected columns appear in the remote SELECT.
- **Parallel partitioned reads**: ``partition_column`` + bounds split the
  table into ``num_partitions`` range queries, one per task.  THIS is the
  100 TB story: a bare JDBC read is a single connection on one executor —
  a bottleneck no cluster size fixes; partitioned reads scale with the
  database's capacity to serve concurrent range scans.
- **Batched writes**: ``batchsize`` bounds rows per INSERT round trip.

Driver availability is environment-specific: this sandbox ships the
Derby embedded engine inside the Spark distribution (tested end to end in
``tests/test_jdbc.py``); other databases need their driver jar on
``spark.jars`` — probe with :func:`jdbc_driver_available` instead of
letting the reader throw a ClassNotFoundException mid-pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: the embedded pure-Java engine bundled with Spark's own jars — always
#: present wherever Spark is, which makes it the test/CI fallback
DERBY_EMBEDDED_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def jdbc_driver_available(spark: SparkSession, driver_class: str) -> bool:
    """True iff ``driver_class`` is loadable in Spark's JVM (works for any
    class, e.g. ``org.postgresql.Driver``)."""
    try:
        spark._jvm.java.lang.Class.forName(driver_class)  # noqa: SLF001
        return True
    except Exception:
        return False


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **options: str,
) -> DataFrame:
    """Read ``table`` (a table name OR a parenthesized subquery alias)
    from ``url``.  Pass ``partition_column``/bounds/``num_partitions``
    together for a parallel read; omit them for small dimension pulls."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        reader = reader.option("driver", driver)
    partition_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(o is not None for o in partition_opts):
        if any(o is None for o in partition_opts):
            raise ValueError(
                "partition_column, lower_bound, upper_bound and num_partitions "
                "must be set together for a partitioned JDBC read"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """Write ``df`` to ``table`` at ``url`` (modes: append / overwrite /
    ignore / error)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
