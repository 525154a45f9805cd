"""C4 page cleaning (operators/c4): the published line + page rules
(Raffel et al., 2020 §2.2), kept/removed split, and the zero-shuffle
plan contract."""

from __future__ import annotations

from azure_databricks_lakehouse_spark.operators.c4 import c4_audit, c4_clean


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string, src string")


GOOD = "this line is a good prose sentence."
GOOD2 = "another full sentence follows right here!"
GOOD3 = 'a quoted ending also counts as terminal."'


def test_line_rules_filter_and_reassemble_in_order(spark):
    text = "\n".join(
        [
            GOOD,
            "no terminal punctuation here",
            "too short.",
            "please enable JavaScript to continue.",
            "we explained our privacy policy in this sentence.",
            GOOD2,
            GOOD3,
        ]
    )
    a = c4_audit(
        _docs(spark, [(1, text, "s")]), min_sentences=1
    ).collect()[0]
    assert a["n_lines"] == 7
    assert a["n_lines_kept"] == 3
    assert a["cleaned"] == "\n".join([GOOD, GOOD2, GOOD3])
    assert a["keep"] is True and a["page_reasons"] == []


def test_page_rules_fire_with_reasons(spark):
    rows = [
        (1, GOOD, "s"),  # 1 sentence < min_sentences=2
        (2, f"{GOOD}\nlorem ipsum dolor sit amet.\n{GOOD2}", "s"),
        (3, f"{GOOD}\nvar x = {{1: 2}}; fine.\n{GOOD2}", "s"),
        (4, f"{GOOD}\nthis mentions frobword openly.\n{GOOD2}", "s"),
        (5, f"{GOOD}\n{GOOD2}", "s"),  # clean page
    ]
    a = {
        r["doc_id"]: r
        for r in c4_audit(
            _docs(spark, rows), min_sentences=2, bad_words=["FROBWORD"]
        ).collect()
    }
    assert a[1]["page_reasons"] == ["too_few_sentences"]
    assert a[2]["page_reasons"] == ["lorem_ipsum"]
    assert a[3]["page_reasons"] == ["brace"]
    assert a[4]["page_reasons"] == ["bad_word"]
    assert a[5]["keep"] is True
    # multiple reasons accumulate
    multi = c4_audit(
        _docs(spark, [(9, "lorem ipsum and a { brace. only.", "s")]),
        min_sentences=5,
    ).collect()[0]
    assert multi["page_reasons"] == ["too_few_sentences", "lorem_ipsum", "brace"]


def test_clean_split_preserves_columns_and_rewrites_text(spark):
    rows = [
        (1, f"{GOOD}\ndropped line\n{GOOD2}", "keepme"),
        (2, "lorem ipsum sits on this page. second sentence here.", "s"),
    ]
    res = c4_clean(_docs(spark, rows), min_sentences=2)
    kept = res.kept.collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert kept[0]["src"] == "keepme"
    assert kept[0]["text"] == f"{GOOD}\n{GOOD2}"
    removed = res.removed.collect()
    assert [(r["doc_id"], r["page_reasons"]) for r in removed] == [
        (2, ["lorem_ipsum"])
    ]


def test_empty_text_and_plan_shape(spark):
    a = c4_audit(_docs(spark, [(1, "", "s")])).collect()[0]
    assert (a["n_lines"], a["n_lines_kept"], a["keep"]) == (1, 0, False)
    # zero-shuffle contract: the audit is one map-only projection
    plan = c4_audit(
        _docs(spark, [(1, GOOD, "s")])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
