"""WebDataset tar-shard source tests: long-format expansion, sample
grouping, and the end-to-end multimodal path (shard -> components ->
FAKEIMG decode via mapInPandas) with no media libraries involved."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.multimodal import (
    decode_fake_images,
    encode_fake_image,
)
from azure_databricks_lakehouse_spark.sources.webdataset import (
    group_samples,
    read_webdataset,
    write_webdataset_shard,
)


def _make_shards(tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    n = 0
    for s in range(2):
        samples = []
        for i in range(3):
            sid = s * 3 + i
            samples.append(
                (
                    f"{sid:06d}",
                    {
                        "img": encode_fake_image(sid, 8 + sid, 4, seed=sid),
                        "json": json.dumps({"id": sid, "label": sid % 2}).encode(),
                        "txt": f"caption for {sid}".encode(),
                    },
                )
            )
        n += write_webdataset_shard(samples, str(shard_dir / f"shard-{s}.tar"))
    return str(shard_dir), n


def test_long_format_components(spark, tmp_path):
    shard_dir, n_members = _make_shards(tmp_path)
    df = read_webdataset(spark, shard_dir)
    assert df.count() == n_members == 18  # 2 shards x 3 samples x 3 parts
    by_suffix = {
        r["suffix"]: r["c"]
        for r in df.groupBy("suffix").agg(F.count("*").alias("c")).collect()
    }
    assert by_suffix == {"img": 6, "json": 6, "txt": 6}
    # payload bytes survive the Arrow boundary intact
    row = df.filter((F.col("key") == "000002") & (F.col("suffix") == "txt")).first()
    assert bytes(row["payload"]) == b"caption for 2"
    assert row["n_bytes"] == len(b"caption for 2")


def test_group_samples_map(spark, tmp_path):
    shard_dir, _ = _make_shards(tmp_path)
    grouped = group_samples(read_webdataset(spark, shard_dir))
    assert grouped.count() == 6
    assert grouped.filter(F.col("n_components") != 3).count() == 0
    row = grouped.filter(F.col("key") == "000004").first()
    assert set(row["parts"].keys()) == {"img", "json", "txt"}
    meta = json.loads(bytes(row["parts"]["json"]))
    assert meta["id"] == 4


def test_shard_to_decode_pipeline(spark, tmp_path):
    """The full multimodal read path: tar shards -> prune to the image
    modality -> Arrow-batched decode -> typed features, joined back to
    metadata by key.  No shuffle before the payload prune."""
    shard_dir, _ = _make_shards(tmp_path)
    comps = read_webdataset(spark, shard_dir)
    imgs = comps.filter(F.col("suffix") == "img").select(
        F.col("key").cast("long").alias("id"), F.col("payload")
    )
    decoded = decode_fake_images(imgs)
    rows = {r["id"]: r for r in decoded.collect()}
    assert len(rows) == 6
    assert all(r["decode_ok"] for r in rows.values())
    assert rows[5]["width"] == 13 and rows[5]["height"] == 4
    assert rows[0]["n_pixels"] == 8 * 4


# --- distributed export ----------------------------------------------------
def test_write_webdataset_round_trips_and_is_deterministic(spark, tmp_path):
    from azure_databricks_lakehouse_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    rows = []
    for i in range(20):
        key = f"{i:06d}"
        rows.append((key, "txt", f"caption {i}".encode(), 0))
        rows.append((key, "img", bytes([i % 251]) * (50 + i), 0))
    comps = spark.createDataFrame(
        [(k, s, p, len(p)) for k, s, p, _ in rows],
        "key string, suffix string, payload binary, n_bytes long",
    )

    out1 = str(tmp_path / "wds1")
    manifest = write_webdataset(comps, out1, n_shards=3).collect()
    assert sum(m["n_members"] for m in manifest) == 40
    assert sum(m["n_samples"] for m in manifest) == 20
    assert len(manifest) <= 3

    back = read_webdataset(spark, out1 + "/*.tar")
    got = {
        (r["key"], r["suffix"]): bytes(r["payload"]) for r in back.collect()
    }
    assert got == {(k, s): p for k, s, p, _ in rows}  # byte-exact round trip

    # determinism: a second export produces byte-identical shard files
    import hashlib, os
    out2 = str(tmp_path / "wds2")
    write_webdataset(comps, out2, n_shards=3).collect()
    h = lambda d: {
        f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(d))
    }
    assert h(out1) == h(out2)


def test_write_webdataset_fills_empty_shards_and_cleans_stale(spark, tmp_path):
    import os as _os

    from azure_databricks_lakehouse_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    comps = spark.createDataFrame(
        [("k0", "txt", b"one", 3)],
        "key string, suffix string, payload binary, n_bytes long",
    )
    out = str(tmp_path / "wds")
    m1 = {r["shard"]: r for r in write_webdataset(comps, out, n_shards=4).collect()}
    # all four shard files exist (three as valid empty tars)
    assert sorted(_os.listdir(out)) == [f"shard-{i:06d}.tar" for i in range(4)]
    assert sum(r["n_members"] for r in m1.values()) == 1
    assert sum(1 for r in m1.values() if r["n_samples"] == 0) == 3
    # empty shards read as empty, not as errors
    assert read_webdataset(spark, out + "/*.tar").count() == 1

    # re-export with fewer shards removes the stale files
    write_webdataset(comps, out, n_shards=2).collect()
    assert sorted(_os.listdir(out)) == [f"shard-{i:06d}.tar" for i in range(2)]
