"""DQ rule engine unit tests: R1-R5 parity with the reference validator
(``silver/silver_rx_claims_load.py:65-135``): tag-don't-drop, reasons
accumulate in registry order, null-allowed amount rule (R5), PASS/FAIL
split."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.dq import (
    FAIL,
    PASS,
    Rule,
    apply_rules,
    completeness,
    split_by_status,
)

_CPT = "^[0-9]{5}$"
_HCPCS = "^[A-Z][0-9]{4}$"


def _claims(spark):
    rows = [
        # claim_id, member_id, service_date, received_date, procedure_code, billed
        ("c1", "m1", dt.date(2024, 1, 1), dt.date(2024, 1, 5), "12345", 100.0),
        ("c2", None, dt.date(2024, 1, 1), dt.date(2024, 1, 5), "12345", 100.0),
        ("c3", "m3", dt.date(2024, 2, 1), dt.date(2024, 1, 5), "12345", 100.0),
        ("c4", "m4", dt.date(2024, 1, 1), dt.date(2024, 1, 5), "1234X", 100.0),
        ("c5", "m5", dt.date(2024, 1, 1), dt.date(2024, 1, 5), "A1234", -5.0),
        ("c6", "m6", dt.date(2024, 1, 1), dt.date(2024, 1, 5), "12345", None),
        (None, None, dt.date(2024, 2, 1), dt.date(2024, 1, 5), "bad", -1.0),
    ]
    return spark.createDataFrame(
        rows,
        "claim_id string, member_id string, service_date date, "
        "received_date date, procedure_code string, billed_amount double",
    )


def _rules():
    return [
        *completeness("claim_id", "member_id"),
        Rule("service_after_received", F.col("service_date") <= F.col("received_date")),
        Rule(
            "invalid_procedure_code",
            F.col("procedure_code").rlike(_CPT) | F.col("procedure_code").rlike(_HCPCS),
        ),
        # R5: billed_amount > 0 *only when present* — nulls pass
        # (silver/silver_rx_claims_load.py:120-127).
        Rule(
            "nonpositive_billed_amount",
            F.col("billed_amount").isNull() | (F.col("billed_amount") > 0),
        ),
    ]


def test_tagging_reasons_and_status(spark):
    out = {
        r["claim_id"]: (r["dq_status"], r["dq_failure_reasons"])
        for r in apply_rules(_claims(spark), _rules()).collect()
    }
    assert out["c1"] == (PASS, None)
    assert out["c2"] == (FAIL, ["missing_member_id"])
    assert out["c3"] == (FAIL, ["service_after_received"])
    assert out["c4"] == (FAIL, ["invalid_procedure_code"])
    assert out["c5"] == (FAIL, ["nonpositive_billed_amount"])
    # R5 null-allowed: c6 has null billed_amount and must PASS
    assert out["c6"] == (PASS, None)
    # multi-failure row accumulates in registry order
    assert out[None] == (
        FAIL,
        [
            "missing_claim_id",
            "missing_member_id",
            "service_after_received",
            "invalid_procedure_code",
            "nonpositive_billed_amount",
        ],
    )


def test_tag_dont_drop_preserves_rowcount(spark):
    df = _claims(spark)
    assert apply_rules(df, _rules()).count() == df.count()


def test_split_by_status(spark):
    tagged = apply_rules(_claims(spark), _rules())
    passed, failed = split_by_status(tagged)
    assert passed.count() == 2  # c1, c6
    assert failed.count() == 5
    assert passed.count() + failed.count() == tagged.count()


def test_no_rules_all_pass(spark):
    out = apply_rules(_claims(spark), []).select("dq_status").distinct().collect()
    assert [r["dq_status"] for r in out] == [PASS]


def test_r4_null_procedure_code_passes(spark):
    # Reference R4 failure predicate is isNotNull() & ~rlike
    # (silver/silver_rx_claims_load.py:110-117): a NULL procedure_code is
    # NOT invalid — it must promote to Silver, same null-guard shape as R5.
    from azure_databricks_lakehouse_spark.operators.dq import claims_rules

    rows = [
        ("c1", "m1", "p1", dt.date(2024, 1, 1), dt.date(2024, 1, 5), None, 10.0),
        ("c2", "m2", "p2", dt.date(2024, 1, 1), dt.date(2024, 1, 5), "bad", 10.0),
    ]
    df = spark.createDataFrame(
        rows,
        "claim_id string, member_id string, provider_id string, "
        "service_date date, received_date date, procedure_code string, "
        "billed_amount double",
    )
    out = {
        r["claim_id"]: (r["dq_status"], r["dq_failure_reasons"])
        for r in apply_rules(df, claims_rules(F.lit("2024-06-01"))).collect()
    }
    assert out["c1"] == (PASS, None)
    assert out["c2"] == (FAIL, ["invalid_procedure_code"])


def test_null_predicate_counts_as_failure(spark):
    # A comparison over a null value is null-valued; the engine must treat
    # "could not positively pass" as FAIL (defensive semantics).
    df = spark.createDataFrame([(None,)], "x double")
    out = apply_rules(df, [Rule("x_positive", F.col("x") > 0)]).collect()[0]
    assert out["dq_status"] == FAIL
    assert out["dq_failure_reasons"] == ["x_positive"]
