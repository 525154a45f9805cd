"""Declarative data-quality rule engine (tag → split → quarantine).

Re-expresses the reference's 5-rule tag-don't-drop validator
(``apply_data_quality_rules``, ``silver/silver_rx_claims_load.py:65-135``)
as a general rule registry.  A rule is ``(name, pass-predicate Column)``;
failures accumulate into an ``array<string>`` reasons column and set
``dq_status`` to FAIL (``silver/silver_rx_claims_load.py:130-133``), after
which FAIL rows are quarantined and PASS rows continue
(``silver/silver_rx_claims_load.py:213-227``).

Implementation is pure Catalyst (no UDFs): one ``array_compact(array(...))``
expression evaluates every rule in a single projection — Catalyst collapses
it into one codegen stage, so adding rules costs no extra passes.  The
reference's as-written accumulation (``coalesce(col, lit([])) + [reason]``,
``silver/silver_rx_claims_load.py:87``) is invalid PySpark; this implements
the documented intent (SURVEY.md §0.2).

At 100 TB: tagging is a narrow map-side transformation — no shuffle; the
PASS/FAIL split is two complementary filters over one cached scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PASS = "PASS"
FAIL = "FAIL"


@dataclass(frozen=True)
class Rule:
    """A named pass-predicate: rows where ``predicate`` is not true fail.

    Null predicate results count as failures (defensive: a null-valued
    comparison means the rule could not positively pass).  Mirrors R1-R5
    dimensions (completeness/validity/consistency) named at
    ``silver/silver_rx_claims_load.py:70-74``.
    """

    name: str
    predicate: Column


def completeness(*cols: str) -> list[Rule]:
    """R1-style rules: one per required column (loop-generated, mirroring
    ``silver/silver_rx_claims_load.py:81-89``)."""
    return [Rule(f"missing_{c}", F.col(c).isNotNull()) for c in cols]


def apply_rules(
    df: DataFrame,
    rules: list[Rule],
    reasons_col: str = "dq_failure_reasons",
    status_col: str = "dq_status",
) -> DataFrame:
    """Tag every row with accumulated failure reasons + PASS/FAIL status.

    Reasons array is null when all rules pass (reference keeps the column
    null-initialized, ``silver/silver_rx_claims_load.py:78``); order of
    reasons == registry order, deterministically.
    """
    if not rules:
        return df.withColumn(reasons_col, F.lit(None).cast("array<string>")).withColumn(
            status_col, F.lit(PASS)
        )
    tagged = F.array_compact(
        F.array(
            *[
                F.when(~r.predicate.eqNullSafe(F.lit(True)), F.lit(r.name))
                for r in rules
            ]
        )
    )
    return df.withColumn(
        reasons_col, F.when(F.size(tagged) > 0, tagged)
    ).withColumn(
        status_col,
        F.when(F.col(reasons_col).isNotNull(), F.lit(FAIL)).otherwise(F.lit(PASS)),
    )


# Claims validation constants (silver/silver_rx_claims_load.py:26-27):
# CPT is five digits, HCPCS a letter plus four digits.
CPT_PATTERN = "^[0-9]{5}$"
HCPCS_PATTERN = "^[A-Z][0-9]{4}$"

_CLAIMS_REQUIRED = (
    "claim_id",
    "member_id",
    "provider_id",
    "service_date",
    "received_date",
)


def claims_rules(
    as_of: Column | None = None,
    required: tuple[str, ...] = _CLAIMS_REQUIRED,
) -> list[Rule]:
    """The reference's R1-R5 registry
    (``silver/silver_rx_claims_load.py:65-135``), shared by the Silver
    pipeline and the oracle-checked claims queries so the two can never
    drift.

    ``as_of`` parameterizes R2's "not in the future" bound: the pipeline
    passes nothing (current_date, the reference semantics), oracle
    queries pass a fixed literal (deterministic cross-engine).
    """
    bound = F.current_date() if as_of is None else as_of
    return [
        *completeness(*required),
        Rule("service_date_in_future", F.col("service_date") <= bound),
        Rule(
            "service_after_received", F.col("service_date") <= F.col("received_date")
        ),
        # R4: format-valid only when present (silver:110-117) — the
        # reference's isNotNull() & ~rlike failure predicate promotes
        # NULL procedure_code rows, so the pass-predicate needs the same
        # null guard R5 has; without it the engine's
        # null-predicate-fails semantics would quarantine NULLs.
        Rule(
            "invalid_procedure_code",
            F.col("procedure_code").isNull()
            | F.col("procedure_code").rlike(CPT_PATTERN)
            | F.col("procedure_code").rlike(HCPCS_PATTERN),
        ),
        # R5: positive only when present (silver:120-127) — nulls pass.
        Rule(
            "nonpositive_billed_amount",
            F.col("billed_amount").isNull() | (F.col("billed_amount") > 0),
        ),
    ]


def split_by_status(
    df: DataFrame, status_col: str = "dq_status"
) -> tuple[DataFrame, DataFrame]:
    """(pass_df, fail_df) — two complementary filters over one plan
    (``silver/silver_rx_claims_load.py:213-214``).  Caller should cache the
    tagged frame when materializing both branches (fixes the reference's
    double-execution inefficiency, SURVEY.md §3.2 step 5)."""
    return df.filter(F.col(status_col) == PASS), df.filter(F.col(status_col) == FAIL)
