"""Product quantization (PQ) ANN: compressed codes + ADC search, zero-UDF.

Completes the similarity-search ladder (q30 brute-force cosine → q31
LSH → q48/`operators/ann` IVF) with the memory-side half of the
FAISS-style design: **IVF-PQ** (Jégou, Douze, Schmid 2011).  At 100 TB
the scan-cost problem is solved by IVF cell pruning; the BYTES problem
— a billion 64-dim float64 embeddings is half a terabyte of vector
payload per replica — is solved by PQ: each vector is stored as ``m``
small codes (one byte each at ``ks=256``), a 64× compression at
``m=8``, and search ranks candidates from the codes alone (asymmetric
distance computation, ADC) without ever touching the original vectors.

Spark-first shape:

- **Training** batches the per-subspace k-means into one Lloyd job
  per round (`operators/ann.lloyd_multi`)
  over the SLICED vector column — m bounded k-means runs on bounded
  samples; the codebook is ``m × ks × (dim/m)`` doubles of driver
  metadata (8 KB at m=8, ks=16, dim=64).
- **Encoding** is one map-side projection: per subspace, a literal
  fold (`F.aggregate`) over the codebook picks the nearest sub-centroid
  — no join, no shuffle, cost ∝ corpus × ks × dim flops exactly like
  any PQ encoder, embarrassingly parallel.
- **ADC search** mirrors the classic two-phase trick: each query
  precomputes its ``m × ks`` distance TABLE (one expression, evaluated
  once per query row on the BROADCAST side of the join), then every
  candidate costs just m table lookups (`element_at`) and a sum — not
  a dim-length distance.  Candidates shuffle nowhere: the codes table
  streams map-side past the broadcast queries.
- **IVF-PQ** stores codes alongside the coarse cell id; search probes
  ``n_probe`` cells (partition-prunable, as in `operators/ann`) and
  ADC-ranks only those cells' codes.  Codes are trained on RESIDUALS
  (vector minus its coarse centroid) — the FAISS default, because
  residuals concentrate near zero and quantize far better than raw
  vectors spread across cells.

Accuracy contract: PQ distances are approximations; rank quality is
what matters (recall@k against the exact scan — measured in tests).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.operators.ann import (
    _sq_dist,
    build_ivf,
    farthest_first_seeds,
    lloyd_multi,
)


@dataclass(frozen=True)
class PQCodebook:
    """Trained product quantizer: ``centroids[m][j]`` is the j-th
    sub-centroid of subspace m (each of length ``dsub``)."""

    m: int
    ks: int
    dsub: int
    centroids: list  # list[list[list[float]]]

    @property
    def dim(self) -> int:
        return self.m * self.dsub


def _subvec(emb, m_idx: int, dsub: int):
    return F.slice(emb, m_idx * dsub + 1, dsub)


def train_pq(
    vecs: DataFrame,
    *,
    m: int = 4,
    ks: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    coarse_centroids: list | None = None,
) -> PQCodebook:
    """Train one ``ks``-centroid k-means per subspace.  When
    ``coarse_centroids`` (the IVF quantizer) is given, training runs on
    RESIDUALS — subtract each vector's nearest coarse centroid first —
    which is what makes PQ codes sharp inside IVF cells."""
    dim = len(vecs.select(emb_col).first()[emb_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    base = vecs
    if coarse_centroids is not None:
        base = _residuals(vecs, coarse_centroids, id_col, emb_col).select(
            id_col, F.col("__res").alias(emb_col)
        )
    # Round 13: the m per-subspace k-means problems train TOGETHER —
    # one hash-ordered seed sample of FULL vectors sliced per subspace
    # on the driver (identical per-subspace samples to m separate
    # collects, since the hash order ignores the subvector), then
    # lloyd_multi runs one assignment + one aggregate job per round for
    # ALL subspaces.  Action count drops from m×(1 + n_iter) to
    # 1 + n_iter; the math per subspace is unchanged.
    sample = [
        list(r[emb_col])
        for r in base.select(emb_col, F.xxhash64(id_col).alias("__h"))
        .orderBy("__h")
        .limit(max(256, 4 * ks))
        .collect()
    ]
    seeds = [
        farthest_first_seeds(
            [v[mi * dsub : (mi + 1) * dsub] for v in sample], ks
        )
        for mi in range(m)
    ]
    sub_long = base.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("mi"),
                        _subvec(F.col(emb_col), mi, dsub).alias("sv"),
                    )
                    for mi in range(m)
                ]
            )
        ).alias("__s"),
    ).select(id_col, "__s.mi", "__s.sv")
    books = lloyd_multi(sub_long, seeds, n_iter, id_col=id_col)
    return PQCodebook(m=m, ks=ks, dsub=dsub, centroids=books)


def _residuals(
    vecs: DataFrame, coarse: list, id_col: str, emb_col: str
) -> DataFrame:
    """``(id, emb, cell, __res)``: each vector's IVF cell and its
    residual vector — one map-side pass over broadcast centroids."""
    assigned = build_ivf(vecs, coarse, id_col=id_col, emb_col=emb_col)
    cent_df = F.broadcast(
        vecs.sparkSession.createDataFrame(coarse, "cell int, cemb array<double>")
    )
    return assigned.join(cent_df, "cell").select(
        id_col,
        emb_col,
        "cell",
        F.zip_with(F.col(emb_col), F.col("cemb"), lambda x, c: x - c).alias(
            "__res"
        ),
    )


def _code_expr(src, cb: PQCodebook, mi: int):
    """Nearest sub-centroid index for subspace ``mi`` — a literal fold
    over the codebook, fully inside codegen."""
    entries = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.array(*[F.lit(float(x)) for x in c]).alias("c"),
            )
            for j, c in enumerate(cb.centroids[mi])
        ]
    )
    sub = _subvec(src, mi, cb.dsub)
    best = F.aggregate(
        entries,
        F.struct(
            F.lit(-1).alias("j"), F.lit(float("inf")).alias("d")
        ),
        lambda acc, e: F.when(
            _sq_dist(sub, e["c"]) < acc["d"],
            F.struct(e["j"].alias("j"), _sq_dist(sub, e["c"]).alias("d")),
        ).otherwise(acc),
    )
    return best["j"]


def pq_encode(
    vecs: DataFrame,
    cb: PQCodebook,
    *,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    coarse_centroids: list | None = None,
) -> DataFrame:
    """``(id, codes array<int>[, cell])`` — the compressed index.  One
    projection, no shuffle; with ``coarse_centroids`` the codes are
    residual codes and the coarse cell rides along (IVF-PQ layout)."""
    if coarse_centroids is not None:
        src = _residuals(vecs, coarse_centroids, id_col, emb_col)
        codes = F.array(*[_code_expr(F.col("__res"), cb, mi) for mi in range(cb.m)])
        return src.select(id_col, "cell", codes.alias("codes"))
    codes = F.array(*[_code_expr(F.col(emb_col), cb, mi) for mi in range(cb.m)])
    return vecs.select(id_col, codes.alias("codes"))


def _query_table_expr(qemb, cb: PQCodebook):
    """The per-query ADC distance table: ``tab[m][j]`` = squared L2
    between the query's m-th subvector and sub-centroid j.  Evaluated
    ONCE per query row (broadcast side); candidates then pay m lookups."""
    return F.array(
        *[
            F.array(
                *[
                    _sq_dist(
                        _subvec(qemb, mi, cb.dsub),
                        F.array(*[F.lit(float(x)) for x in c]),
                    )
                    for c in cb.centroids[mi]
                ]
            )
            for mi in range(cb.m)
        ]
    )


def _adc_dist(tab, codes, m: int):
    """sum_m tab[m][codes[m]] — 1-based element_at."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, mi: acc
        + F.element_at(
            F.element_at(tab, mi + F.lit(1)),
            F.element_at(codes, mi + F.lit(1)) + F.lit(1),
        ),
    )


def _rerank(
    cand: DataFrame,
    queries: DataFrame,
    rerank_with: DataFrame,
    *,
    top_k: int,
    id_col: str,
    emb_col: str,
    query_id_col: str,
) -> DataFrame:
    """Exact-distance refinement (the ADC+R step every production PQ
    deployment runs): the approximate top ``rerank_factor × k``
    candidates join back to their ORIGINAL vectors and re-rank on true
    squared L2.  The candidate set is (queries × factor·k) rows —
    broadcast it past the corpus vectors map-side; only the final
    window touches anything, and it is candidate-sized."""
    nvec = rerank_with.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("__nemb")
    )
    qvec = F.broadcast(
        queries.select(F.col(query_id_col), F.col(emb_col).alias("__qemb"))
    )
    d = _sq_dist(F.col("__qemb"), F.col("__nemb"))
    w = Window.partitionBy(query_id_col).orderBy("d", "neighbor_id")
    return (
        nvec.join(F.broadcast(cand), "neighbor_id")
        .join(qvec, query_id_col)
        .select(query_id_col, "neighbor_id", d.alias("d"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(query_id_col, "neighbor_id", "rank")
    )


def pq_search(
    codes_df: DataFrame,
    queries: DataFrame,
    cb: PQCodebook,
    *,
    top_k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    query_id_col: str = "query_id",
    rerank_with: DataFrame | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Exhaustive ADC scan (no coarse pruning): every candidate costs m
    table lookups.  The scale baseline for PQ alone — use
    :func:`ivfpq_search` to add cell pruning on top.

    ``rerank_with`` (the original vector table) enables exact-distance
    refinement of the approximate top ``rerank_factor × top_k`` — ADC
    recall is bounded by quantization resolution; re-ranking recovers
    near-exact recall while still scanning only codes."""
    qt = F.broadcast(
        queries.select(
            F.col(query_id_col),
            _query_table_expr(F.col(emb_col), cb).alias("__qtab"),
        )
    )
    d = _adc_dist(F.col("__qtab"), F.col("codes"), cb.m)
    w = Window.partitionBy(query_id_col).orderBy("d", "neighbor_id")
    keep = top_k * rerank_factor if rerank_with is not None else top_k
    out = (
        codes_df.crossJoin(qt)
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), d.alias("d"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= keep)
        .select(query_id_col, "neighbor_id", "rank")
    )
    if rerank_with is None:
        return out
    return _rerank(
        out.drop("rank"),
        queries,
        rerank_with,
        top_k=top_k,
        id_col=id_col,
        emb_col=emb_col,
        query_id_col=query_id_col,
    )


def ivfpq_search(
    codes_df: DataFrame,
    queries: DataFrame,
    coarse: list,
    cb: PQCodebook,
    *,
    top_k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    query_id_col: str = "query_id",
    rerank_with: DataFrame | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """FAISS-style IVF-PQ: probe ``n_probe`` coarse cells, ADC-rank the
    residual codes inside them.  ``codes_df`` is `pq_encode(...,
    coarse_centroids=...)` output — ``(id, cell, codes)``.
    ``rerank_with`` adds the exact-distance refinement step (see
    :func:`pq_search`).

    The query's ADC table is computed per (query, probed cell) against
    the query RESIDUAL for that cell — matching the residual encoding —
    then every candidate in the cell costs m lookups.  The candidate
    join keys on the cell id; with the codes table partitioned by cell
    (see `operators/ann.save_ivf_index`) the scan prunes at file level
    too."""
    spark = codes_df.sparkSession
    cent_df = F.broadcast(
        spark.createDataFrame(coarse, "cell int, cemb array<double>")
    )
    qdist = _sq_dist(F.col("qemb"), F.col("cemb"))
    wq = Window.partitionBy(query_id_col).orderBy("qdist", "cell")
    res = F.zip_with(F.col("qemb"), F.col("cemb"), lambda x, c: x - c)
    probes = (
        queries.select(F.col(query_id_col), F.col(emb_col).alias("qemb"))
        .crossJoin(cent_df)
        .select(query_id_col, "qemb", "cell", "cemb", qdist.alias("qdist"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= n_probe)
        .select(
            query_id_col,
            "cell",
            _query_table_expr(res, cb).alias("__qtab"),
        )
    )
    d = _adc_dist(F.col("__qtab"), F.col("codes"), cb.m)
    w = Window.partitionBy(query_id_col).orderBy("d", "neighbor_id")
    keep = top_k * rerank_factor if rerank_with is not None else top_k
    out = (
        codes_df.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), d.alias("d"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= keep)
        .select(query_id_col, "neighbor_id", "rank")
    )
    if rerank_with is None:
        return out
    return _rerank(
        out.drop("rank"),
        queries,
        rerank_with,
        top_k=top_k,
        id_col=id_col,
        emb_col=emb_col,
        query_id_col=query_id_col,
    )
