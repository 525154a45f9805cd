"""VARIANT-typed columns as first-class table citizens (Databricks
VARIANT, GA in DBR 15.3; Spark 4 ``VariantType`` / ``parse_json`` /
``variant_get``).

The engine stores variant columns through the normal parquet write
path (Spark's parquet writer shreds variant to its binary encoding);
the subtlety is the METADATA plane: the installed pyarrow predates the
VARIANT parquet LogicalType and rejects such files at footer OPEN, so
every pyarrow-footer path (write-time stats sidecar, metadata-exact
COUNT, identity allocation sizing) falls back to Spark's own JVM
footer reader (``tables._jvm_footer_rows``) — row counts stay exact
and zero-data-read; per-column min/max stats are simply absent (the
file never prunes, reads stay correct).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.sql import Lakehouse
from azure_databricks_lakehouse_spark.sources.tables import ParquetTable


def _mk(spark, root):
    df = spark.sql(
        "SELECT id AS k, parse_json(format_string("
        "'{\"a\": %d, \"tags\": [\"x\",\"y\"]}', id)) AS payload "
        "FROM range(10)"
    )
    return ParquetTable.create(spark, root, df)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vtbl")


def test_create_read_roundtrip(spark, root):
    t = _mk(spark, root)
    assert t.read().schema.simpleString() == "struct<k:bigint,payload:variant>"
    got = (
        t.read()
        .selectExpr("k", "variant_get(payload, '$.a', 'int') AS a")
        .orderBy("k")
        .collect()
    )
    assert [(r.k, r.a) for r in got] == [(i, i) for i in range(10)]


def test_metadata_count_exact_via_jvm_footer(spark, root):
    # pyarrow cannot open these footers; count() must still be exact
    # (JVM footer fallback) and never scan data
    t = _mk(spark, root)
    t.append(
        spark.sql("SELECT id AS k, parse_json('{\"a\": 99}') AS payload "
                  "FROM range(10, 12)")
    )
    assert t.count() == 12


def test_dml_lifecycle_on_variant_table(spark, root):
    t = _mk(spark, root)
    t.update("k = 5", {"payload": F.expr("parse_json('{\"a\": -1}')")})
    assert (
        t.read()
        .filter("k = 5")
        .selectExpr("variant_get(payload, '$.a', 'int') AS a")
        .collect()[0]
        .a
        == -1
    )
    t.delete("k >= 8")
    assert t.count() == 8
    src = spark.sql(
        "SELECT id AS k, parse_json('{\"a\": 1000}') AS payload "
        "FROM range(4, 6)"
    )
    t.merge(src, on=["k"])
    assert [c.operation for c in t.history()] == [
        "CREATE",
        "UPDATE",
        "DELETE",
        "MERGE",
    ]
    got = (
        t.read()
        .filter("k IN (4, 5)")
        .selectExpr("variant_get(payload, '$.a', 'int') AS a")
        .collect()
    )
    assert sorted(r.a for r in got) == [1000, 1000]


def test_time_travel_and_cdf_carry_variant(spark, root):
    t = _mk(spark, root)
    t.delete("k < 3")
    assert t.read(version=0).count() == 10
    chg = t.changes_between(0, 1)  # (start, end]: the v1 DELETE
    assert chg.filter("_change_type = 'delete'").count() == 3
    vals = (
        chg.selectExpr("variant_get(payload, '$.a', 'int') AS a")
        .orderBy("a")
        .collect()
    )
    assert [r.a for r in vals] == [0, 1, 2]


def test_sql_frontend_ctas_and_select(spark, tmp_path):
    lh = Lakehouse(spark, warehouse=str(tmp_path / "wh"))
    lh.sql(
        "CREATE TABLE vt AS SELECT id AS k, "
        "parse_json(format_string('{\"n\": %d}', id * 2)) AS j "
        "FROM range(5)"
    )
    got = lh.sql(
        "SELECT k, variant_get(j, '$.n', 'int') AS n FROM vt ORDER BY k"
    ).collect()
    assert [(r.k, r.n) for r in got] == [(i, 2 * i) for i in range(5)]
    # metadata COUNT fast path must stay exact on a variant table
    assert lh.sql("SELECT COUNT(*) AS c FROM vt").collect()[0].c == 5


def test_optimize_compacts_variant_files(spark, root):
    t = _mk(spark, root)
    t.append(
        spark.sql("SELECT id AS k, parse_json('{\"a\": 7}') AS payload "
                  "FROM range(20, 22)")
    )
    before = t.count()
    t.optimize()
    assert t.count() == before
    a = (
        t.read()
        .filter("k = 21")
        .selectExpr("variant_get(payload, '$.a', 'int') AS a")
        .collect()[0]
        .a
    )
    assert a == 7


def test_streaming_cdf_accepts_top_level_variant(spark, root):
    # round 11: top-level variant STREAMS (parquet_compat strips the
    # footer annotation pyarrow rejects; VariantVal rebuilds from the
    # engine's unshredded pair — tests/test_cdf_stream.py drives it
    # end-to-end).  Only NESTED variant still refuses at construction.
    import json as _json

    from pyspark.sql.types import StructType

    from azure_databricks_lakehouse_spark.sources.cdf_stream import (
        TableChangesStreamReader,
    )

    t = _mk(spark, root)
    schema = StructType.fromJson(_json.loads(t._manifest()["schema"]))
    reader = TableChangesStreamReader(schema, {"path": root})
    assert reader.variant_fields  # the variant column is recognized
