"""Claims DQ queries: the reference's rule engine wired to the oracle gate.

The reference's most distinctive operator is the 5-rule tag-don't-drop
validator (``apply_data_quality_rules``,
``silver/silver_rx_claims_load.py:65-135``): R1 completeness on required
ids/dates, R2 service date not in the future, R3 service <= received, R4
procedure code CPT ``^[0-9]{5}$`` or HCPCS ``^[A-Z][0-9]{4}$``
(``silver/silver_rx_claims_load.py:26-27``), R5 ``billed_amount > 0`` only
when present (nulls allowed, ``:120-127``).  Failures accumulate into an
``array<string>`` reasons column in registry order; ``dq_status`` FAIL rows
are quarantined, PASS rows continue (``:213-227``).

The corpus has no claims table, so these queries derive a deterministic
claims-shaped frame from lineitem x orders, seeding every failure mode via
modular arithmetic on keys — identical expressions in the DataFrame build
and the DuckDB oracle, so the tagged output is hash-comparable.

R2 uses a fixed ``as_of`` literal instead of ``current_timestamp()``
(non-deterministic across engines; SURVEY.md §7.3) — same semantics, stable
oracle.

Scale: tagging is a pure projection (no shuffle); the reason-count rollup
explodes only the FAIL minority after a map-side filter; the gate summary
is a single grouped aggregate.  Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.functions.numeric import dec_sum, dec_sum_sql
from azure_databricks_lakehouse_spark.operators.dq import (
    CPT_PATTERN as _CPT,
)
from azure_databricks_lakehouse_spark.operators.dq import (
    HCPCS_PATTERN as _HCPCS,
)
from azure_databricks_lakehouse_spark.operators.dq import (
    apply_rules,
    claims_rules,
)
from azure_databricks_lakehouse_spark.queries import QuerySpec
from azure_databricks_lakehouse_spark.sources.catalog import bind, spread

_AS_OF = "2000-06-01"  # deterministic stand-in for current_timestamp (R2)


def _claims_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic claims-shaped frame from lineitem x orders.

    Failure seeding (same CASE logic in ``_CLAIMS_SQL``, mirrored line by
    line):
    - claim_id null when l_orderkey % 97 == 0                  -> R1
    - member_id null when o_custkey % 89 == 0                  -> R1
    - received 3 days before service when l_partkey % 11 == 0  -> R3
    - garbage lowercase code when l_partkey % 17 == 0          -> R4
    - billed null when l_orderkey % 101 == 0 (allowed: R5 null-pass)
    - billed negative for returned first lines                 -> R5
    """
    t = bind(spark, sf_dir, "lineitem", "orders")
    # spread the single-file lineitem scan: the broadcast join below and
    # the whole derived-claims projection + R1–R5 tagging (regex battery
    # included) stay below the first exchange and would otherwise run in
    # ONE task (catalog.spread — a no-op on real multi-file tables)
    li = spread(
        t["lineitem"].select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_shipdate", "l_returnflag", "l_extendedprice",
        ),
        "l_orderkey",
    )
    j = li.join(t["orders"], li.l_orderkey == t["orders"].o_orderkey)
    sd = F.to_date("l_shipdate")
    claim_id = F.when(F.col("l_orderkey") % 97 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("C"), (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string"))
    )
    member_id = F.when(F.col("o_custkey") % 89 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("M"), F.col("o_custkey").cast("string"))
    )
    received = F.when(F.col("l_partkey") % 11 == 0, F.date_add(sd, -3)).otherwise(
        F.date_add(sd, (F.col("l_suppkey") % 30).cast("int"))
    )
    proc = (
        F.when(
            F.col("l_partkey") % 17 == 0,
            F.concat(F.lit("bad"), (F.col("l_partkey") % 1000).cast("string")),
        )
        .when(
            F.col("l_partkey") % 13 == 0,
            F.concat(
                F.lit("A"), F.lpad((F.col("l_suppkey") % 10000).cast("string"), 4, "0")
            ),
        )
        .otherwise(F.lpad((F.col("l_partkey") % 100000).cast("string"), 5, "0"))
    )
    billed = (
        F.when(F.col("l_orderkey") % 101 == 0, F.lit(None).cast("double"))
        .when(
            (F.col("l_returnflag") == "R") & (F.col("l_linenumber") == 1),
            -F.col("l_extendedprice"),
        )
        .otherwise(F.col("l_extendedprice"))
    )
    return j.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("line_uid"),
        claim_id.alias("claim_id"),
        member_id.alias("member_id"),
        sd.alias("service_date"),
        received.alias("received_date"),
        proc.alias("procedure_code"),
        billed.alias("billed_amount"),
    )


_CLAIMS_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS line_uid,
       CASE WHEN l_orderkey % 97 = 0 THEN NULL
            ELSE 'C' || CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) END AS claim_id,
       CASE WHEN o_custkey % 89 = 0 THEN NULL
            ELSE 'M' || CAST(o_custkey AS VARCHAR) END AS member_id,
       CAST(l_shipdate AS DATE) AS service_date,
       CASE WHEN l_partkey % 11 = 0 THEN CAST(l_shipdate AS DATE) - 3
            ELSE CAST(l_shipdate AS DATE) + CAST(l_suppkey % 30 AS INT) END AS received_date,
       CASE WHEN l_partkey % 17 = 0 THEN 'bad' || CAST(l_partkey % 1000 AS VARCHAR)
            WHEN l_partkey % 13 = 0 THEN 'A' || lpad(CAST(l_suppkey % 10000 AS VARCHAR), 4, '0')
            ELSE lpad(CAST(l_partkey % 100000 AS VARCHAR), 5, '0') END AS procedure_code,
       CASE WHEN l_orderkey % 101 = 0 THEN NULL
            WHEN l_returnflag = 'R' AND l_linenumber = 1 THEN -l_extendedprice
            ELSE l_extendedprice END AS billed_amount
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def _rules() -> list[Rule]:
    """R1-R5 from the shared registry (``operators/dq.claims_rules`` —
    the same list the Silver pipeline applies), with a fixed ``as_of``
    and the derived frame's required-column subset (it carries no
    provider_id)."""
    return claims_rules(
        as_of=F.lit(_AS_OF).cast("date"),
        required=("claim_id", "member_id", "service_date", "received_date"),
    )


# SQL twin of apply_rules over the claims CTE: one CASE per rule, nulls
# filtered, empty array -> NULL (operators/dq.py semantics: a rule fails
# when its predicate IS NOT TRUE).
_TAGGED_SQL = f"""
WITH claims AS ({_CLAIMS_SQL}),
tagged AS (
  SELECT *,
         list_filter([
           CASE WHEN (claim_id IS NOT NULL) IS NOT TRUE THEN 'missing_claim_id' END,
           CASE WHEN (member_id IS NOT NULL) IS NOT TRUE THEN 'missing_member_id' END,
           CASE WHEN (service_date IS NOT NULL) IS NOT TRUE THEN 'missing_service_date' END,
           CASE WHEN (received_date IS NOT NULL) IS NOT TRUE THEN 'missing_received_date' END,
           CASE WHEN (service_date <= DATE '{_AS_OF}') IS NOT TRUE THEN 'service_date_in_future' END,
           CASE WHEN (service_date <= received_date) IS NOT TRUE THEN 'service_after_received' END,
           CASE WHEN (procedure_code IS NULL
                      OR regexp_matches(procedure_code, '{_CPT}')
                      OR regexp_matches(procedure_code, '{_HCPCS}')) IS NOT TRUE
                THEN 'invalid_procedure_code' END,
           CASE WHEN (billed_amount IS NULL OR billed_amount > 0) IS NOT TRUE
                THEN 'nonpositive_billed_amount' END
         ], x -> x IS NOT NULL) AS fr
  FROM claims
)
SELECT * EXCLUDE (fr),
       CASE WHEN len(fr) > 0 THEN fr END AS dq_failure_reasons,
       CASE WHEN len(fr) > 0 THEN 'FAIL' ELSE 'PASS' END AS dq_status
FROM tagged
"""


# --- q16: full tagged claims output (§2.11 R1-R5, F7 array accumulation) ---
def q16_claims_dq_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The engine keeps reference semantics (null reasons array when all
    # rules pass); the *output projection* renders the array as a sorted
    # '|'-joined string because the driver's canonicalizer sorts pandas
    # frames over every output column and list-typed cells are unhashable.
    # Same information, harness-sortable. Every rule still evaluates
    # (reasons reflect all five); the payload stays narrow — this query's
    # cost is result materialization, not compute.
    tagged = apply_rules(_claims_frame(spark, sf_dir), _rules())
    return tagged.select(
        "line_uid",
        "claim_id",
        F.array_join(
            F.array_sort(
                F.coalesce("dq_failure_reasons", F.array().cast("array<string>"))
            ),
            "|",
        ).alias("dq_failure_reasons"),
        "dq_status",
    )


_Q16_SQL = f"""
WITH x AS ({_TAGGED_SQL})
SELECT line_uid, claim_id,
       COALESCE(array_to_string(list_sort(dq_failure_reasons), '|'), '')
         AS dq_failure_reasons,
       dq_status
FROM x
"""


# --- q17: failure-reason rollup (conditional aggregation per rule) ---------
def q17_claims_dq_reason_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-reason failure counts as ONE conditional aggregation pass —
    not explode(reasons)+groupBy.  Exploding the tagged array invites
    Catalyst to push the generate's implicit ``size > 0`` filter below
    the tagging projection, inlining the whole 8-rule expression (regex
    battery included) into the filter AND the status predicate AND the
    generator — measured 8.7 s vs < 1 s at sf0.1 for identical output.
    Conditional sums also shrink the shuffle to one row of partials per
    partition (map-side combine of 8 counters)."""
    claims = _claims_frame(spark, sf_dir)
    rules = _rules()
    wide = claims.agg(
        *[
            F.sum(
                F.when(~r.predicate.eqNullSafe(F.lit(True)), 1).otherwise(0)
            ).alias(r.name)
            for r in rules
        ]
    )
    stack = ", ".join(f"'{r.name}', {r.name}" for r in rules)
    return (
        wide.selectExpr(
            f"stack({len(rules)}, {stack}) AS (reason, n_failures)"
        )
        .filter(F.col("n_failures") > 0)
        .withColumn("n_failures", F.col("n_failures").cast("long"))
    )


_Q17_SQL = f"""
WITH t AS ({_TAGGED_SQL}),
exploded AS (
  SELECT unnest(dq_failure_reasons) AS reason FROM t WHERE dq_status = 'FAIL'
)
SELECT reason, COUNT(*) AS n_failures FROM exploded GROUP BY reason
"""


# --- q18: DQ gate summary (PASS/FAIL split + quarantined money at stake) ---
def q18_claims_dq_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tagged = apply_rules(_claims_frame(spark, sf_dir), _rules())
    return tagged.groupBy("dq_status").agg(
        F.count(F.lit(1)).alias("n_claims"),
        F.count_distinct("member_id").alias("n_members"),
        dec_sum("billed_amount").alias("sum_billed"),
    )


_Q18_SQL = f"""
WITH t AS ({_TAGGED_SQL})
SELECT dq_status,
       COUNT(*) AS n_claims,
       COUNT(DISTINCT member_id) AS n_members,
       {dec_sum_sql('billed_amount')} AS sum_billed
FROM t
GROUP BY dq_status
"""


QUERIES: dict[str, QuerySpec] = {
    "q16_claims_dq_tags": QuerySpec(q16_claims_dq_tags, _Q16_SQL),
    "q17_claims_dq_reason_counts": QuerySpec(q17_claims_dq_reason_counts, _Q17_SQL),
    "q18_claims_dq_gate": QuerySpec(q18_claims_dq_gate, _Q18_SQL),
}
