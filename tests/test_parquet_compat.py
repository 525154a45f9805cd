"""Footer-compat shim (``sources/parquet_compat.py``): parquet files
whose footers carry logical types the installed pyarrow rejects
(VARIANT) become readable by stripping the annotation in memory —
data pages untouched, every other column's type preserved."""

from __future__ import annotations

import glob
import os

import pytest

from azure_databricks_lakehouse_spark.sources.parquet_compat import (
    read_table_compat,
    strip_unknown_logical_types,
)


def _write(spark, tmp_path, sql, shredded=False):
    d = str(tmp_path / ("shred" if shredded else "plain"))
    key = "spark.sql.variant.writeShredding.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, str(shredded).lower())
    try:
        spark.sql(sql).coalesce(1).write.parquet(d, mode="overwrite")
    finally:
        spark.conf.set(key, old)
    return glob.glob(os.path.join(d, "*.parquet"))[0]


def test_variant_file_reads_with_types_preserved(spark, tmp_path):
    f = _write(
        spark,
        tmp_path,
        "SELECT id AS k, parse_json(concat('{\"a\":', id, '}')) AS v, "
        "CAST(id AS TIMESTAMP) AS ts, CAST(id AS DECIMAL(10,2)) AS d, "
        "CAST(id AS STRING) AS s, id % 2 = 0 AS b FROM range(10)",
    )
    import pyarrow.parquet as pq

    with pytest.raises(OSError, match="LogicalType"):
        pq.read_table(f)  # the refusal the shim exists for
    t = read_table_compat(f)
    assert t.num_rows == 10
    names = dict(zip(t.schema.names, t.schema.types))
    # non-variant logical types survive the strip untouched
    assert str(names["s"]) == "string"
    assert str(names["d"]).startswith("decimal128(10, 2)")
    assert "timestamp" in str(names["ts"])
    assert str(names["b"]) == "bool"
    # the variant column reads as the raw {value, metadata} pair
    v = t.to_pylist()[3]["v"]
    assert set(v) == {"value", "metadata"}
    assert isinstance(v["value"], bytes) and isinstance(v["metadata"], bytes)
    # and the pair rebuilds the logical value
    from pyspark.sql.types import VariantVal

    assert VariantVal(v["value"], v["metadata"]).toJson() == '{"a":3}'


def test_plain_file_passes_through(spark, tmp_path):
    f = _write(spark, tmp_path, "SELECT id AS k, CAST(id AS STRING) AS s FROM range(5)")
    t = read_table_compat(f)
    assert t.num_rows == 5
    assert sorted(r["k"] for r in t.to_pylist()) == [0, 1, 2, 3, 4]


def test_strip_is_identity_without_unknown_types(spark, tmp_path):
    f = _write(spark, tmp_path, "SELECT id AS k FROM range(3)")
    import struct

    data = open(f, "rb").read()
    flen = struct.unpack("<I", data[-8:-4])[0]
    footer = data[-8 - flen : -8]
    assert strip_unknown_logical_types(footer) == footer


def test_shredded_file_reads_but_carries_typed_value(spark, tmp_path):
    # the engine never writes this form (_write_files disables
    # shredding); the shim still OPENS such a file — consumers detect
    # the typed_value subtree and refuse with the batch workaround
    f = _write(
        spark,
        tmp_path,
        "SELECT 1 AS k, parse_json('{\"a\":7}') AS v",
        shredded=True,
    )
    t = read_table_compat(f)
    assert "typed_value" in str(t.schema.field("v").type)
