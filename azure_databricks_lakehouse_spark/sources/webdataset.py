"""WebDataset-style tar-shard source for multimodal training data.

The WebDataset layout stores a dataset as a sequence of ``.tar`` shards;
each *sample* is a group of adjacent files sharing a basename key with
different suffixes (``000017.img`` + ``000017.json`` + ``000017.txt``).
Sequential tar reads give full-bandwidth sequential I/O on object stores,
and one-task-per-shard is exactly Spark's ``binaryFile`` execution model —
so the distributed plumbing here is real even though heavyweight media
decoding stays behind the container's codec gate
(``operators/multimodal.decode_images``).

Scale notes:

- One shard = one input row = one task; shards are sized (100-500 MB)
  so a row fits executor memory comfortably.  1000 executors x N shards
  parallelize with zero coordination — there is no shuffle anywhere in
  the read path.
- ``read_webdataset`` emits LONG format (one row per sample component)
  so downstream column pruning drops payload bytes the consumer doesn't
  need before any shuffle; ``group_samples`` pivots to one-row-per-sample
  with a ``map<suffix, payload>`` only when the caller asks.
- The tar expansion is ``mapInPandas`` (Arrow-batched) and pure Python
  ``tarfile`` — no media libraries involved.
"""

from __future__ import annotations

import io
import posixpath
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SAMPLE_SCHEMA = (
    "shard string, key string, suffix string, payload binary, n_bytes long"
)


def read_webdataset(spark: SparkSession, paths: str) -> DataFrame:
    """Read tar shards matching ``paths`` (a path/glob) into long-format
    sample components: ``(shard, key, suffix, payload, n_bytes)``.

    ``key`` is the member basename up to its first dot, ``suffix`` the
    remainder — the WebDataset grouping convention.  Directories and
    hidden/metadata members are skipped.
    """
    shards = spark.read.format("binaryFile").load(paths).select("path", "content")

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for member in tf:
                        if not member.isfile():
                            continue
                        base = posixpath.basename(member.name)
                        if base.startswith("."):
                            continue
                        key, dot, suffix = base.partition(".")
                        if not dot:
                            key, suffix = base, ""
                        data = tf.extractfile(member).read()
                        rows.append((path, key, suffix, data, len(data)))
            yield pd.DataFrame(
                rows, columns=["shard", "key", "suffix", "payload", "n_bytes"]
            )

    return shards.mapInPandas(_expand, SAMPLE_SCHEMA)


def group_samples(components: DataFrame) -> DataFrame:
    """Pivot long-format components to one row per sample:
    ``(shard, key, parts map<string, binary>, n_components)``.

    One hash aggregate on (shard, key); components of a sample always
    come from the same shard row, so with AQE the exchange is small and
    never wide — but prefer staying in long format (and pruning
    ``payload``) when the consumer only needs one modality."""
    return (
        components.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("suffix", "payload"))
            ).alias("parts"),
            F.count(F.lit(1)).alias("n_components"),
        )
    )


def write_webdataset_shard(samples: list[tuple[str, dict]], dest: str) -> int:
    """Test/fixture helper: write ``[(key, {suffix: bytes})]`` as one tar
    shard at local path ``dest``; returns the number of members written.
    (Production shard *writing* belongs to the data-prep job that owns
    sharding policy; the engine's contract is the read path.)"""
    n = 0
    with tarfile.open(dest, "w") as tf:
        for key, parts in samples:
            for suffix, data in sorted(parts.items()):
                info = tarfile.TarInfo(name=f"{key}.{suffix}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                n += 1
    return n
