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


def write_webdataset(
    components: DataFrame,
    dest_dir: str,
    *,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Distributed WebDataset export: long-format components
    ``(key, suffix, payload)`` become EXACTLY ``n_shards`` tar shards
    under ``dest_dir`` (``shard-000000.tar`` ...).  Runs immediately (an
    export is inherently an action) and returns the shard manifest
    ``(shard, n_samples, n_members, n_bytes)`` with one row per shard —
    shard ids that received no samples (few keys, skewed hash) are
    written as VALID EMPTY tars so a reader iterating the documented
    names never hits a missing file, and stale ``shard-*.tar`` files
    from a previous export with different ``n_shards``/``seed`` are
    removed so a glob of ``dest_dir`` matches the manifest exactly.

    Placement is deterministic: a sample's shard is
    ``xxhash64(seed, key) % n_shards``, so re-exports are byte-identical
    (members are sorted, tar metadata is fixed) and a sample's components
    always travel together without any ordering assumption upstream.

    Scale shape: ONE shuffle (the groupBy on shard id) moves each
    sample's bytes to its writer task; each shard is written by exactly
    one task via Arrow-batched ``applyInPandas`` — the write mirror of
    the one-task-per-shard read path.  Size ``n_shards`` so a shard
    (total bytes / n_shards) fits a writer task's memory, the same
    100-500 MB envelope the read path assumes.  ``dest_dir`` must be
    storage every executor can reach (shared FS / object-store mount);
    tasks write their own shard file only, so there is no cross-writer
    coordination.
    """
    import os

    os.makedirs(dest_dir, exist_ok=True)
    tagged = components.withColumn(
        "_shard_id",
        F.pmod(F.xxhash64(F.lit(seed), F.col("key")), F.lit(n_shards)).cast("int"),
    )

    def _write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import uuid

        shard_id = int(pdf["_shard_id"].iloc[0])
        name = f"shard-{shard_id:06d}.tar"
        path = os.path.join(dest_dir, name)
        # write-aside + atomic rename: a task that dies mid-write must
        # never leave a truncated-but-valid-looking tar at the final
        # name, and two attempts of the same task (speculation, retry
        # racing a zombie) must not interleave bytes into one file.
        # The attempt-unique temp name keeps writers disjoint; whichever
        # os.replace lands last wins with a COMPLETE file (attempts are
        # deterministic, so the contents are identical).
        tmp = os.path.join(dest_dir, f".{name}.tmp-{uuid.uuid4().hex[:12]}")
        pdf = pdf.sort_values(["key", "suffix"], kind="mergesort")
        n_bytes = 0
        try:
            with tarfile.open(tmp, "w") as tf:
                for key, suffix, payload in zip(
                    pdf["key"], pdf["suffix"], pdf["payload"]
                ):
                    data = bytes(payload)
                    info = tarfile.TarInfo(name=f"{key}.{suffix}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
                    n_bytes += len(data)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return pd.DataFrame(
            {
                "shard": [name],
                "n_samples": [int(pdf["key"].nunique())],
                "n_members": [len(pdf)],
                "n_bytes": [n_bytes],
            }
        )

    written = (
        tagged.groupBy("_shard_id")
        .applyInPandas(
            _write_shard,
            schema="shard string, n_samples long, n_members long, n_bytes long",
        )
        .collect()
    )
    rows = {r["shard"]: r for r in written}
    expected = {f"shard-{i:06d}.tar" for i in range(n_shards)}
    for name in sorted(expected - rows.keys()):
        with tarfile.open(os.path.join(dest_dir, name), "w"):
            pass  # valid empty tar
    for name in os.listdir(dest_dir):
        stale_shard = (
            name.startswith("shard-")
            and name.endswith(".tar")
            and name not in expected
        )
        # temp files from crashed attempts (normal attempts replace
        # theirs away; the finally only covers in-process failures)
        leaked_tmp = name.startswith(".shard-") and ".tmp-" in name
        if stale_shard or leaked_tmp:
            os.remove(os.path.join(dest_dir, name))
    spark = components.sparkSession
    return spark.createDataFrame(
        [
            (
                name,
                int(rows[name]["n_samples"]) if name in rows else 0,
                int(rows[name]["n_members"]) if name in rows else 0,
                int(rows[name]["n_bytes"]) if name in rows else 0,
            )
            for name in sorted(expected)
        ],
        "shard string, n_samples long, n_members long, n_bytes long",
    )
