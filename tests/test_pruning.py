"""Prune-predicate parser + evaluator: sound (False only when no row
can match) and useful (prunes the shapes DML conditions actually take)."""

from __future__ import annotations

from azure_databricks_lakehouse_spark.plans.pruning import (
    may_match,
    parse_predicate,
)


def _mm(sql, stats=None, parts=None):
    pred = parse_predicate(sql)
    assert pred is not None, f"expected prunable: {sql}"
    return may_match(pred, stats or {}, parts or {})


def test_range_comparisons_prune_by_stats():
    stats = {"k": [10, 20]}
    assert _mm("k = 15", stats)
    assert not _mm("k = 5", stats)
    assert not _mm("k = 25", stats)
    assert _mm("k < 11", stats) and not _mm("k < 10", stats)
    assert _mm("k <= 10", stats) and not _mm("k <= 9", stats)
    assert _mm("k > 19", stats) and not _mm("k > 20", stats)
    assert _mm("k >= 20", stats) and not _mm("k >= 21", stats)
    assert _mm("k != 15", stats)
    assert not _mm("k != 7", {"k": [7, 7]})
    assert _mm("15 <= k", stats) and not _mm("25 <= k", stats)  # mirrored


def test_in_between_and_strings():
    stats = {"k": [10, 20], "name": ["apple", "mango"]}
    assert _mm("k IN (1, 15, 99)", stats)
    assert not _mm("k IN (1, 2, 99)", stats)
    assert _mm("k BETWEEN 18 AND 30", stats)
    assert not _mm("k BETWEEN 21 AND 30", stats)
    assert _mm("name = 'banana'", stats)
    assert not _mm("name = 'zebra'", stats)
    assert _mm("name >= 'm'", stats) and not _mm("name > 'mango'", stats)


def test_and_or_compose():
    stats = {"k": [10, 20], "v": [0, 5]}
    assert not _mm("k = 5 AND v = 3", stats)  # one NO kills the AND
    assert _mm("k = 5 OR v = 3", stats)  # one MAYBE keeps the OR
    assert not _mm("k = 5 OR v = 9", stats)
    assert _mm("(k = 15 AND v = 3) OR k = 99", stats)


def test_partition_values_decide_exactly():
    parts = {"part": "a", "day": "2024-03-01"}
    assert _mm("part = 'a'", parts=parts)
    assert not _mm("part = 'b'", parts=parts)
    assert not _mm("part IN ('b', 'c')", parts=parts)
    assert _mm("day >= '2024-02-15'", parts=parts)
    assert not _mm("day < DATE '2024-03-01'", parts=parts)
    assert _mm("day BETWEEN '2024-02-01' AND '2024-03-31'", parts=parts)
    # numeric partition values coerce (directory strings vs numbers)
    assert _mm("n = 7", parts={"n": "7"})
    assert not _mm("n > 7", parts={"n": "7"})
    # hive NULL partition: comparisons can never match, IS NULL can
    parts_null = {"part": "__HIVE_DEFAULT_PARTITION__"}
    assert not _mm("part = 'a'", parts=parts_null)
    assert _mm("part IS NULL", parts=parts_null)
    assert not _mm("part IS NOT NULL", parts=parts_null)
    assert not _mm("part IS NULL", parts={"part": "a"})


def test_unknowns_default_to_read():
    # no stats for the column -> must read
    assert _mm("k = 5", {"other": [1, 2]})
    # IS NULL on a stats column: footers carry no null counts -> read
    assert _mm("k IS NULL", {"k": [1, 2]})
    # type confusion (string literal vs numeric stats) -> read
    assert _mm("k = 'abc'", {"k": [1, 2]})


def test_unprunable_shapes_return_none():
    assert parse_predicate("k % 2 = 0") is None  # unlexable operator
    assert parse_predicate("NOT k = 5") is None  # negation -> top
    assert parse_predicate("f(k) = 5") is None  # function call
    assert parse_predicate("k = v") is None  # col-vs-col
    assert parse_predicate("") is None
    # NOT inside a conjunct poisons only its branch - the AND survives
    pred = parse_predicate("k = 5 AND NOT v = 3")
    assert pred is not None
    assert not may_match(pred, {"k": [10, 20]}, {})  # k=5 still prunes


def _gm(sql, generated, parts, stats=None, pvals=None):
    from azure_databricks_lakehouse_spark.plans.pruning import (
        augment_generated_partitions,
    )

    pred = augment_generated_partitions(
        parse_predicate(sql), generated, parts
    )
    assert pred is not None
    return may_match(pred, stats or {}, pvals or {})


def test_generated_day_partition_pruning():
    """A timestamp predicate implies bounds on its to_date-generated
    partition column — the Delta generated-column pruning whitelist."""
    gen = {"day": "to_date(ts)"}
    aug = lambda sql, pv: _gm(sql, gen, ["day"], pvals={"day": pv})
    # equality and ranges relax to day bounds, exact on the boundary day
    assert aug("ts = '2026-08-14 10:00:00'", "2026-08-14")
    assert not aug("ts = '2026-08-14 10:00:00'", "2026-08-15")
    assert aug("ts >= '2026-08-14 10:00:00'", "2026-08-14")  # same-day rows
    assert not aug("ts >= '2026-08-14 10:00:00'", "2026-08-13")
    assert aug("ts < '2026-08-14 00:00:00'", "2026-08-14")  # relaxed <=
    assert not aug("ts < '2026-08-14 00:00:00'", "2026-08-15")
    assert aug(
        "ts BETWEEN '2026-08-10 00:00:00' AND '2026-08-12 23:00:00'",
        "2026-08-11",
    )
    assert not aug(
        "ts BETWEEN '2026-08-10 00:00:00' AND '2026-08-12 23:00:00'",
        "2026-08-13",
    )
    assert aug("ts IN ('2026-08-14 01:00:00')", "2026-08-14")
    assert not aug("ts IN ('2026-08-14 01:00:00')", "2026-08-12")
    # != implies nothing; non-date literals imply nothing — both stay MAY
    assert aug("ts != '2026-08-14 10:00:00'", "2026-08-14")
    assert _gm("ts = 1723600000", gen, ["day"], pvals={"day": "2000-01-01"})
    # composition under AND/OR stays row-wise sound
    assert not aug(
        "amount > 5 AND ts >= '2026-08-14 10:00:00'", "2026-08-10"
    )
    assert aug(
        "ts >= '2026-08-20 00:00:00' OR ts <= '2026-08-01 00:00:00'",
        "2026-08-01",
    )


def test_generated_year_and_cast_templates():
    assert not _gm(
        "ts >= '2026-01-01 00:00:00'",
        {"yr": "year(ts)"},
        ["yr"],
        pvals={"yr": "2024"},
    )
    assert _gm(
        "ts >= '2026-01-01 00:00:00'",
        {"yr": "year(ts)"},
        ["yr"],
        pvals={"yr": "2026"},
    )
    assert not _gm(
        "ts = '2026-08-14 10:00:00'",
        {"day": "CAST(ts AS DATE)"},
        ["day"],
        pvals={"day": "2026-08-13"},
    )
    # a generated col that is NOT a partition col implies nothing
    assert _gm(
        "ts = '2026-08-14 10:00:00'",
        {"day": "to_date(ts)"},
        ["region"],
        pvals={"region": "emea"},
    )
