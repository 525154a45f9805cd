"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas — schema, batch shape across partitions, corrupt-payload
handling, and the gated real-decoder stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.multimodal import (
    byte_histogram,
    decode_fake_images,
    decode_images,
    encode_fake_image,
    pillow_available,
)


def _frame(spark):
    rows = [
        (1, encode_fake_image(1, 4, 3)),
        (2, encode_fake_image(2, 2, 2, seed=100)),
        (3, b"not an image"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_fake_decode_values_and_schema(spark):
    out = decode_fake_images(_frame(spark))
    assert out.columns == ["id", "width", "height", "n_pixels", "mean_pixel", "decode_ok"]
    got = {r["id"]: r for r in out.collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_pixels"]) == (4, 3, 12)
    assert got[1]["mean_pixel"] == pytest.approx(sum(range(12)) / 12)
    assert got[2]["mean_pixel"] == pytest.approx((100 + 101 + 102 + 103) / 4)
    assert got[3]["decode_ok"] is False and got[3]["width"] is None
    assert got[4]["decode_ok"] is False


def test_decode_across_partitions(spark):
    # batch shape must not depend on partitioning
    df = _frame(spark).repartition(3)
    ok = decode_fake_images(df).filter(F.col("decode_ok")).count()
    assert ok == 2


def test_byte_histogram(spark):
    df = spark.createDataFrame(
        [(1, bytes([0] * 3 + [255])), (2, None)], "id long, payload binary"
    )
    got = {r["id"]: r for r in byte_histogram(df, bins=16).collect()}
    assert got[1]["n_bytes"] == 4
    hist = got[1]["histogram"]
    assert len(hist) == 16
    assert hist[0] == pytest.approx(0.75) and hist[15] == pytest.approx(0.25)
    assert sum(hist) == pytest.approx(1.0)
    assert got[2]["n_bytes"] == 0 and sum(got[2]["histogram"]) == 0.0


def test_real_decoder_is_gated(spark):
    if pillow_available():
        pytest.skip("Pillow present; stub gate not applicable")
    with pytest.raises(NotImplementedError):
        decode_images(_frame(spark))
