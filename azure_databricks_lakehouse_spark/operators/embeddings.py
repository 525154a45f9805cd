"""Embedding-modality incremental dedup: batch vs a persisted LSH index.

The embedding twin of
:func:`~azure_databricks_lakehouse_spark.operators.fingerprints.dedup_batch_against_index`:
an ingestion pipeline keeps TWO corpus-scale tables on disk — the
hyperplane-LSH signature table ``(id, band, sig)`` and the embedding
table ``(id, emb, norm)`` — and screens each arriving batch against them
without ever shuffling or recomputing the corpus side:

1. batch signatures (a map-side projection over the batch) are
   **broadcast** and probed against the signature table: a candidate is
   any (batch, corpus) pair colliding in ANY band (OR-amplification,
   the q46 discipline — candidate volume tracks true similarity, never
   all-pairs);
2. the candidate ids (bounded by actual collisions) fetch their corpus
   embeddings by a second broadcast probe of the embedding table;
3. exact cosine ≥ ``min_cosine`` verifies candidates only; the best
   match per batch vector decides rejection.

Every corpus-side operation is a map-side probe of a columnar scan; the
per-batch cost is independent of corpus size.  Kept vectors' signature
and embedding rows are returned ready to append, so the NEXT batch
screens against them — the same grow-the-index contract as the
fingerprint twin (and the same MERGE-sink streaming composition
applies).

Hyperplanes are deterministic plan-build literals: sign ±1 per
(plane, dimension) derived from md5 — no runtime hash evaluation per
row beyond the dot products, and index and batch always agree on the
planes (they are part of the index's identity, like ``k``/``w`` for
winnowing).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_MAX_DIM = 512


def _signs(plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane for ``plane``, width ``dim``."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"emb-plane:{plane}:{j}".encode()).digest()
        out.append(1.0 if h[0] % 2 == 0 else -1.0)
    return out


def _dot_signs(emb: Column, plane: int, dim: int) -> Column:
    signs = F.array(*[F.lit(s) for s in _signs(plane, dim)])
    return F.aggregate(
        F.zip_with(emb, signs, lambda x, s: x * s),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def embedding_dim(df: DataFrame, emb_col: str = "emb") -> int:
    row = df.select(F.size(emb_col).alias("d")).first()
    if row is None:
        raise ValueError("embedding_dim: input frame has no rows")
    dim = row["d"]
    if dim > _MAX_DIM:
        raise ValueError(
            f"embedding dim {dim} exceeds supported width {_MAX_DIM}"
        )
    return dim


def embedding_signatures(
    vecs: DataFrame,
    *,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    bands: int = 4,
    planes_per_band: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """``(id_col, band, sig)`` — one hyperplane-LSH signature per band
    (OR-amplified banding).  Pure projection + explode: zero shuffle,
    scales with input splits.  ``bands``/``planes_per_band`` are part of
    the index identity — probe with the values the index was built with."""
    dim = embedding_dim(vecs, emb_col) if dim is None else dim
    entries = []
    for b in range(bands):
        bits = [
            F.when(
                _dot_signs(F.col(emb_col), b * planes_per_band + p, dim) >= 0,
                F.lit(1 << p),
            ).otherwise(F.lit(0))
            for p in range(planes_per_band)
        ]
        sig = bits[0]
        for bit in bits[1:]:
            sig = sig + bit
        entries.append(
            F.struct(F.lit(b).alias("band"), sig.cast("int").alias("sig"))
        )
    return vecs.select(
        id_col, F.explode(F.array(*entries)).alias("e")
    ).select(id_col, "e.band", "e.sig")


def with_norm(
    vecs: DataFrame, *, emb_col: str = "emb", out_col: str = "norm"
) -> DataFrame:
    return vecs.withColumn(
        out_col,
        F.sqrt(_fold_sum(F.transform(emb_col, lambda x: x * x))),
    )


def dedup_embeddings_against_index(
    batch: DataFrame,
    index_sigs: DataFrame,
    index_vecs: DataFrame,
    *,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    bands: int = 4,
    planes_per_band: int = 8,
    min_cosine: float = 0.95,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Screen a batch of vectors against the persisted corpus index.

    ``index_sigs`` is ``(id_col, band, sig)`` from
    :func:`embedding_signatures`; ``index_vecs`` is ``(id_col, emb,
    norm)`` (see :func:`with_norm`).  Returns ``(kept, rejected,
    new_sig_rows, new_vec_rows)``; ``rejected`` is one row per batch
    vector with its best corpus match ``(id_col, match_id, cosine)``.

    Both corpus tables are probed with BROADCAST batch data — the
    signature probe on (band, sig), the embedding fetch on candidate
    ids — so the corpus is scanned (columnar, prunable) but never
    shuffled, and nothing corpus-sized ever moves."""
    dim = embedding_dim(batch, emb_col)
    batch_sigs = embedding_signatures(
        batch, id_col=id_col, emb_col=emb_col, bands=bands,
        planes_per_band=planes_per_band, dim=dim,
    ).withColumnRenamed(id_col, "_batch_id")
    cands = (
        index_sigs.join(F.broadcast(batch_sigs), ["band", "sig"])
        .select(F.col(id_col).alias("match_id"), "_batch_id")
        .distinct()
    )
    batch_n = with_norm(batch, emb_col=emb_col).select(
        F.col(id_col).alias("_batch_id"),
        F.col(emb_col).alias("_bemb"),
        F.col("norm").alias("_bnorm"),
    )
    fetched = index_vecs.join(
        F.broadcast(cands), index_vecs[id_col] == cands["match_id"]
    ).select("match_id", "_batch_id", emb_col, "norm")
    # zero-norm guard: x/0.0 is NULL in Spark, and a NULL cosine would
    # silently FAIL the >= min_cosine filter — letting all-zero vectors
    # (a common encoder padding/failure sentinel) evade dedup forever
    # and pile up in the index.  Two zero vectors are exact duplicates
    # (cosine 1); zero-vs-nonzero shares no direction (cosine 0).
    denom = F.col("norm") * F.col("_bnorm")
    dot = _fold_sum(
        F.zip_with(F.col(emb_col), F.col("_bemb"), lambda a, b: a * b)
    )
    cos = (
        F.when((F.col("norm") == 0) & (F.col("_bnorm") == 0), F.lit(1.0))
        .when(denom == 0, F.lit(0.0))
        .otherwise(dot / denom)
    )
    scored = (
        fetched.join(F.broadcast(batch_n), "_batch_id")
        .select("_batch_id", "match_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )
    best = (
        scored.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("_batch_id").orderBy(
                    F.desc("cosine"), "match_id"
                )
            ),
        )
        .filter(F.col("_rk") == 1)
        .select(
            F.col("_batch_id").alias(id_col), "match_id", "cosine"
        )
    )
    kept = batch.join(best.select(id_col), id_col, "left_anti")
    new_sigs = batch_sigs.join(
        F.broadcast(best.select(F.col(id_col).alias("_batch_id"))),
        "_batch_id",
        "left_anti",
    ).select(F.col("_batch_id").alias(id_col), "band", "sig")
    new_vecs = with_norm(kept.select(id_col, emb_col), emb_col=emb_col)
    return kept, best, new_sigs, new_vecs
