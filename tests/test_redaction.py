"""PII redaction: rewrite correctness, audit counts, plan shape (single
codegen projection, no shuffle, no UDF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.redaction import redact


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


def test_each_category_redacts(spark):
    rows = redact(
        _df(
            spark,
            [
                "mail me at jane.doe+x@example.co.uk today",
                "card 4111-1111-1111-1111 on file",
                "ssn 123-45-6789 leaked",
                "host 192.168.0.1 responded",
                "call (415) 555-2671 or +1 415.555.2671",
            ],
        )
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["text"] == "mail me at <EMAIL> today"
    assert by_id[0]["pii_email"] == 1 and by_id[0]["pii_total"] == 1
    assert by_id[1]["text"] == "card <CARD> on file"
    assert by_id[2]["text"] == "ssn <SSN> leaked"
    assert by_id[3]["text"] == "host <IP> responded"
    assert "<PHONE>" in by_id[4]["text"] and by_id[4]["pii_phone"] == 2


def test_clean_text_roundtrips_byte_identical(spark):
    texts = ["no pii here at all", "just words 12 34", ""]
    rows = redact(_df(spark, texts)).collect()
    for r in rows:
        assert r["pii_total"] == 0
        assert r["text"] == texts[r["doc_id"]]


def test_card_not_eaten_by_phone(spark):
    # 16-digit card must become one <CARD>, not a half-redacted phone
    [r] = redact(_df(spark, ["pay 4111 1111 1111 1111 now"])).collect()
    assert r["text"] == "pay <CARD> now"
    assert r["pii_card"] == 1 and r["pii_phone"] == 0


def test_other_columns_pass_through_and_audit_optional(spark):
    df = _df(spark, ["a@b.co"]).withColumn("lang", F.lit("en"))
    out = redact(df, audit=False)
    assert set(out.columns) == {"doc_id", "text", "lang"}
    assert out.collect()[0]["text"] == "<EMAIL>"


def test_plan_is_single_stage_no_shuffle(spark):
    out = redact(_df(spark, ["x@y.io"] * 100))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one map-side Project over the scan (the test session runs with
    # whole-stage codegen off — see conftest — so no '*(1)' prefix;
    # shuffle-freedom and UDF-freedom above are the scale contract)
    assert "Project" in plan
