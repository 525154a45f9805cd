"""Silver transform: watermark-incremental cleanse → DQ gate → dedup → MERGE.

Reference parity — ``process_bronze_to_silver``
(``silver/silver_rx_claims_load.py:181-235``) plus the truncated tail
reconstructed from the pattern doc (``bronze_silver_gold/readme.md:42,74``):

1. ST1 watermark lookup (``:29-43``): max processed ingestion_timestamp
   from the control table; full load when none.
2. Incremental bronze read (``:189-195``): the literal watermark predicate
   pushes into the parquet scan (data skipping).
3. Cleansing (``cleanse_and_standardize``, ``:137-157``): trim/upper ids
   and codes (F1), ``to_date`` (F3), decimal(18,2) money casts (P11).
4. DQ rules R1-R5 (``:65-135``) via the declarative engine
   (``operators/dq``), with R5's null-allowed semantics.
5. PASS/FAIL split over one *cached* tagged frame (fixes the reference's
   double execution, SURVEY.md §3.2 step 5); FAIL rows quarantined (S10,
   ``:221-227``).
6. W1 dedup-to-latest per (claim_id, claim_line_number) with the
   reference's tiebreak order (``:159-179``).
7. Silver metadata columns (``:233-235``), MERGE into silver (idempotent
   re-runs), watermark row appended (``:45-63``).

Scale: exactly one wide shuffle (the dedup window on the claim key); the
MERGE reuses it as the upsert join key.  Quarantine + silver writes come
from the same cached tagged frame — one source scan total.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.dedup import keep_latest
from azure_databricks_lakehouse_spark.operators.dq import (
    Rule,
    apply_rules,
    claims_rules,
    split_by_status,
)
from azure_databricks_lakehouse_spark.pipelines.paths import LakehousePaths
from azure_databricks_lakehouse_spark.pipelines.watermarks import (
    append_watermark,
    last_watermark,
)
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable, is_table

_KEYS = ["claim_id", "claim_line_number"]


@dataclass(frozen=True)
class SilverResult:
    n_incremental: int
    n_pass: int
    n_fail: int
    n_upserted: int
    watermark: datetime | None


def cleanse_and_standardize(df: DataFrame) -> DataFrame:
    """F1/F3/P11 cleansing (``silver/silver_rx_claims_load.py:137-157``)."""
    out = df
    for c in ("claim_id", "member_id", "provider_id"):
        out = out.withColumn(c, F.trim(F.col(c)))
    for c in ("procedure_code", "diagnosis_code", "claim_type"):
        out = out.withColumn(c, F.upper(F.trim(F.col(c))))
    for c in ("service_date", "received_date"):
        out = out.withColumn(c, F.to_date(F.col(c)))
    for c in ("billed_amount", "allowed_amount", "paid_amount"):
        out = out.withColumn(c, F.col(c).cast("decimal(18,2)"))
    return out.withColumn(
        "claim_line_number", F.col("claim_line_number").cast("int")
    )


def pipeline_rules() -> list[Rule]:
    """R1-R5 (shared registry, ``operators/dq.claims_rules``) plus a
    merge-safety rule: ``claim_line_number`` is half the silver MERGE key,
    and a null key never matches the upsert's equi anti-join — every
    incremental re-send would duplicate the row.  A non-numeric line
    number (null after the int cast) is therefore quarantined, not
    merged."""
    return [
        *claims_rules(),
        Rule("missing_claim_line_number", F.col("claim_line_number").isNotNull()),
    ]


def process(spark: SparkSession, paths: LakehousePaths) -> SilverResult:
    """Bronze → Silver incremental run; idempotent under re-execution."""
    wm = last_watermark(spark, paths, "silver_rx_claims")
    bronze = ParquetTable.for_path(spark, paths.bronze_claims).read()
    if wm is not None:
        bronze = bronze.filter(F.col("ingestion_timestamp") > F.lit(wm))
    # P13 columns introspection (bronze/bronze_rx_claims_load.py:104): the
    # corrupt side-channel only exists when the bronze schema captured it.
    if "_corrupt_record" in bronze.columns:
        bronze = bronze.filter(F.col("_corrupt_record").isNull()).drop(
            "_corrupt_record"
        )

    n_incremental = bronze.count()
    if n_incremental == 0:
        return SilverResult(0, 0, 0, 0, wm)

    tagged = apply_rules(cleanse_and_standardize(bronze), pipeline_rules()).cache()
    try:
        passed, failed = split_by_status(tagged)
        n_fail = failed.count()
        if n_fail:
            quarantined = failed.withColumn(
                "quarantined_at", F.current_timestamp()
            )
            if is_table(paths.quarantine):
                # Idempotent replay: a re-run of the same bronze delta
                # (e.g. after a failure before the watermark advanced)
                # first clears rows from the same load batches, so the
                # quarantine never accumulates duplicates.
                batch_ids = [
                    r[0]
                    for r in failed.select("bronze_load_id").distinct().collect()
                ]
                qt = ParquetTable.for_path(spark, paths.quarantine)
                qt.delete(F.col("bronze_load_id").isin(batch_ids))
                qt.append(quarantined)
            else:
                ParquetTable.create(spark, paths.quarantine, quarantined)

        deduped = keep_latest(
            passed,
            keys=_KEYS,
            order_by=[
                F.col("received_date").desc(),
                F.col("ingestion_timestamp").desc(),
            ],
        ).withColumn("silver_updated_timestamp", F.current_timestamp())
        n_pass = deduped.count()

        if is_table(paths.silver_claims):
            tbl = ParquetTable.for_path(spark, paths.silver_claims)
            tbl.merge(deduped, on=_KEYS)
        else:
            ParquetTable.create(spark, paths.silver_claims, deduped)

        new_wm = bronze.agg(F.max("ingestion_timestamp")).first()[0]
        append_watermark(spark, paths, "silver_rx_claims", new_wm)
        return SilverResult(n_incremental, n_pass, n_fail, n_pass, new_wm)
    finally:
        tagged.unpersist()


def load_reference_table(
    spark: SparkSession, df: DataFrame, table_root: str, keys: list[str]
) -> None:
    """Members/providers silver load: cleanse-light MERGE upsert keyed on
    the business id (``gold/gold_rx_claims_load.py:94-108`` reads these)."""
    if is_table(table_root):
        ParquetTable.for_path(spark, table_root).merge(df, on=keys)
    else:
        ParquetTable.create(spark, table_root, df)
