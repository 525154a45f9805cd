"""SemDeDup: semantic deduplication via embedding clustering.

The third leg of the embedding-dedup stack beside LSH near-dup
(`operators/embeddings.py`) and exact/fingerprint dedup: cluster the
corpus embeddings with k-means, then remove semantic duplicates WITHIN
each cluster — pairs whose cosine similarity exceeds a threshold — keeping
the member farthest from the cluster centroid (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"; the rule that keeps the least prototypical member
preserves diversity).  This catches paraphrase-level duplicates that
shingle fingerprints miss and LSH only catches near the hyperplane
margin.

Spark-first shape (reference scope: the reference has no vector stack,
so the design citations here are the paper + the engine's own ANN
operators):

- clustering reuses ``operators/ann.train_kmeans`` (driver state = k
  centroids, corpus never shuffled during assignment) and ``build_ivf``
  (map-side broadcast-centroid assignment);
- the within-cluster pair comparison is an EQUI-join on the cell id —
  never a cartesian; cost is Σ|cluster|², the paper's own complexity,
  bounded by choosing k ∝ corpus size (``max_cluster_size`` makes the
  contract explicit by raising instead of silently going quadratic);
- survivor resolution is ONE pass, no iteration: cluster members are
  ranked by centroid distance (farthest first, id tiebreak) and a member
  is removed iff ANY earlier member is ≥ threshold similar — exactly the
  paper's upper-triangular max rule, so no connected-components loop is
  needed;
- normalized embeddings are materialized into a column BEFORE the dot
  product lambda (higher-order-function bodies re-evaluate referenced
  expressions per element — the round-6 lambda-boundary trap, PERF.md).

At 100 TB: one corpus shuffle on the cell id (clusters must fit a
partition — same contract as any groupBy), k-means driver state is
k × dim floats, and every other join is broadcast-sized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.ann import (
    _sq_dist,
    build_ivf,
    train_kmeans,
)
from azure_databricks_lakehouse_spark.operators.embeddings import (
    _fold_sum,
    with_norm,
)


@dataclass(frozen=True)
class SemDedupResult:
    """``kept``: surviving rows of the input frame (all original columns).
    ``removed``: one row per dropped member — its id, cluster, the id of
    the earlier-ranked member that condemned it, and their cosine.
    ``assignments``: (id, cell, centroid_dist) for audit/re-use."""

    kept: DataFrame
    removed: DataFrame
    assignments: DataFrame


def semantic_dedup(
    vecs: DataFrame,
    *,
    k: int = 16,
    threshold: float = 0.95,
    n_iter: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    centroids: list[tuple[int, list[float]]] | None = None,
    max_cluster_size: int | None = None,
) -> SemDedupResult:
    """Drop semantic near-duplicates from ``vecs``.

    ``threshold`` is the cosine above which two same-cluster members are
    duplicates (the paper sweeps 0.7–0.95; higher = more conservative).
    ``centroids`` accepts a pre-trained k-means model (e.g. the persisted
    IVF index's) so dedup can share the ANN index's clustering.
    ``max_cluster_size`` guards the quadratic within-cluster comparison:
    if any cluster exceeds it, raise with the observed size instead of
    silently running a huge self-join — the fix is a larger ``k``.

    Zero-vector rows (norm 0) cannot be cosine-compared; they are kept
    unconditionally and surface in ``assignments`` with NULL distance
    rather than being silently dropped.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    spark = vecs.sparkSession
    base = vecs.select(id_col, emb_col)
    normed = with_norm(base, emb_col=emb_col, out_col="__norm")
    zero = normed.filter(F.col("__norm") == 0.0)
    live = normed.filter(F.col("__norm") > 0.0)

    if centroids is None:
        centroids = train_kmeans(
            live, k=k, n_iter=n_iter, id_col=id_col, emb_col=emb_col
        )
    assigned = build_ivf(
        live.select(id_col, emb_col), centroids, id_col=id_col, emb_col=emb_col
    )
    cent_df = F.broadcast(
        spark.createDataFrame(centroids, "cell int, __cemb array<double>")
    )
    # unit-normalized embedding materialized as a COLUMN so the pair
    # dot-product lambda reads an attribute, not the whole chain per
    # element (lambda-boundary trap)
    ranked_src = (
        assigned.join(live.select(id_col, "__norm"), on=id_col)
        .join(cent_df, on="cell")
        .select(
            id_col,
            "cell",
            _sq_dist(F.col(emb_col), F.col("__cemb")).alias("centroid_dist"),
            F.transform(
                emb_col, lambda x: x / F.col("__norm")
            ).alias("__unit"),
        )
    )
    if max_cluster_size is not None:
        # guard runs BEFORE the quadratic join, so it must execute the
        # assignment subplan early; materialize it so the later
        # rank/pair jobs reuse the result instead of recomputing the
        # crossJoin+window assignment a second time
        ranked_src = ranked_src.localCheckpoint(eager=True)
        worst = (
            ranked_src.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"))
            .collect()[0]["mx"]
        )
        if worst and worst > max_cluster_size:
            raise ValueError(
                f"largest cluster holds {worst} members "
                f"(> max_cluster_size={max_cluster_size}); the within-"
                "cluster comparison is quadratic — increase k"
            )
    # farthest-from-centroid first: the member kept out of any duplicate
    # group is the least prototypical one (diversity-preserving rule)
    rk = F.row_number().over(
        Window.partitionBy("cell").orderBy(
            F.col("centroid_dist").desc(), F.col(id_col).asc()
        )
    )
    ranked = ranked_src.withColumn("rk", rk)
    a = ranked.select(
        F.col("cell"),
        F.col("rk").alias("rk_a"),
        F.col(id_col).alias("keeper_id"),
        F.col("__unit").alias("__ua"),
    )
    b = ranked.select(
        F.col("cell"),
        F.col("rk").alias("rk_b"),
        F.col(id_col).alias("removed_id"),
        F.col("__unit").alias("__ub"),
    )
    cos = _fold_sum(F.zip_with("__ua", "__ub", lambda x, y: x * y))
    pairs = (
        a.join(b, on="cell")  # equi-join on cell; rank filter below
        .filter(F.col("rk_a") < F.col("rk_b"))
        .select("cell", "keeper_id", "removed_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(threshold))
    )
    best = F.row_number().over(
        Window.partitionBy("removed_id").orderBy(
            F.col("cosine").desc(), F.col("keeper_id").asc()
        )
    )
    removed = (
        pairs.withColumn("__b", best).filter(F.col("__b") == 1).drop("__b")
    )
    kept = vecs.join(
        removed.select(F.col("removed_id").alias(id_col)),
        on=id_col,
        how="anti",
    )
    assignments = ranked.select(id_col, "cell", "centroid_dist").unionByName(
        zero.select(
            id_col,
            F.lit(None).cast("int").alias("cell"),
            F.lit(None).cast("double").alias("centroid_dist"),
        )
    )
    return SemDedupResult(kept=kept, removed=removed, assignments=assignments)
