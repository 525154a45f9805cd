"""SparkSession factory with scale-aware defaults.

Reference parity: the reference configures Delta session extensions at
``bronze/bronze_rx_claims_load.py:11-15``.  This engine runs on OSS Spark;
Delta extensions are applied only when ``delta-spark`` is importable
(gated — the test container ships plain Spark 4.x, where the lakehouse
table layer falls back to Parquet-native tables, ``sources/tables.py``).

Note: ``spark.driver.memory`` (like any spark.driver.* conf) only applies
when this factory creates the first JVM; on an already-running session the
builder config is silently ignored.

Scale stance: AQE on (runtime re-plan, skew-join splitting, post-shuffle
coalesce) so the same declarative plans survive a 1000-executor / 100 TB
deployment; shuffle partitions default to a local-friendly number but are
overridable via env for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def delta_available() -> bool:
    """True when the delta-spark package is importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def get_spark(
    app_name: str = "lakehouse-engine",
    master: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults chosen for correctness-at-scale:
    - AQE + coalesce + skew join: runtime re-planning so static estimates
      (broadcast thresholds, partition counts) self-correct on real data.
    - UTC session timezone: deterministic date/timestamp semantics.
    - Arrow enabled: vectorized pandas interchange for the few Pandas-UDF
      extension operators (multimodal decode); the relational core is
      UDF-free.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions or _DEF_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # TIMESTAMP(NANOS) parquet columns (the corpus `events.ts`) read as
        # long nanos instead of erroring; sources/catalog.load_table converts.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{_DEF_CPUS}]")
    if delta_available():
        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
