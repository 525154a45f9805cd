"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

The published recipe for steering a crawl-scale pretraining corpus
toward a high-quality target distribution (the method behind
"select web pages that look like Wikipedia/books"): represent every
document as hashed n-gram counts, fit two bag-of-buckets unigram models
(target corpus vs raw pool), score each raw document with the
log-likelihood ratio, and sample the corpus ∝ exp(score) via Gumbel
top-k.  Complements :mod:`operators.mixture` (which reweights whole
DOMAINS): DSIR ranks individual DOCUMENTS.

Spark-first shape, zero UDF:

- **Features** are hashed (uni+bi)-gram counts: one projection builds
  the gram array (tokens materialized into a column BEFORE the lambda
  that pairs them — the O(len²) recompute trap), `md5`-derived buckets
  keep Spark and the DuckDB oracle bit-identical, and one
  explode + hash-aggregate yields ``(id, bucket, n)`` with map-side
  partials.  Nothing in the hot path is per-row Python.
- **Fitting is ∝ dim, not corpus**: each corpus collapses to at most
  ``dim`` bucket counts (partial-aggregated before the shuffle); the
  ratio table is built over ``spark.range(dim)`` with corpus totals
  broadcast-attached as scalar state — no ``collect()`` anywhere.
- **Scoring** broadcast-joins the dim-row ratio table to the feature
  counts and folds per-document contributions SORTED BY BUCKET
  (``collect_list → array_sort → aggregate``), the same sequential-fold
  trick the BM25/RRF operators use, so double summation order — and
  therefore the resampled set — is identical in any engine and under
  any partitioning.
- **Resampling** is the Gumbel top-k trick: key = score + G where
  G = -ln(-ln(u)) and u is the deterministic md5 uniform
  (`functions/hashing.md5_uniform01` — strictly interior, so G is
  always finite).  Top-k is ``orderBy(...).limit(k)`` —
  TakeOrderedAndProject, a per-partition heap + driver merge of k
  rows, never a global sort.

At 100 TB: features and scores are projections + one (id, bucket)
aggregate; the only broadcast is the dim-row ratio table (KBs); the
top-k never materializes more than k rows per partition.  Skewed
documents (pathologically long texts) bound their cost by their own
token count — there is no cross-document join at all.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.functions.hashing import (
    md5_u16,
    md5_uniform01,
)

DEFAULT_DIM = 4096


@dataclass(frozen=True)
class ImportanceModel:
    """Fitted DSIR model: ``ratios`` is a complete ``dim``-row frame
    ``(bucket int, log_ratio double)`` — every possible feature bucket
    has a row (unseen buckets carry the smoothed prior ratio), so
    scoring never needs a fallback constant.  The frame is lazy like
    any DataFrame; persist it (or write it to a table) when scoring
    many batches against one fit."""

    ratios: DataFrame
    dim: int
    bigrams: bool
    smoothing: float


def _gram_buckets(df: DataFrame, text_col: str, dim: int, bigrams: bool):
    """Adds ``__bucket`` via posexplode-free explode of the hashed gram
    array; returns the exploded frame (one row per gram occurrence)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    out = df.withColumn("__toks", toks)
    grams = F.col("__toks")
    if bigrams:
        bi = F.when(
            F.size("__toks") >= 2,
            F.zip_with(
                F.slice(F.col("__toks"), 1, F.size("__toks") - 1),
                F.slice(F.col("__toks"), 2, F.size("__toks") - 1),
                lambda a, b: F.concat(a, F.lit("_"), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(grams, bi)
    return (
        out.withColumn("__gram", F.explode(grams))
        .withColumn("__bucket", md5_u16(F.col("__gram")) % F.lit(dim))
        .drop("__toks", "__gram")
    )


def feature_counts(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    bigrams: bool = True,
) -> DataFrame:
    """Hashed n-gram counts per document: ``(id, bucket, n)``.

    The ``bucket`` column carries ``(dim, bigrams)`` as field metadata so
    :func:`fit_importance_subset` can refuse a features frame built under
    different hashing parameters (a mismatched ``dim`` would silently
    join buckets >= dim to nothing and skew every ratio)."""
    return (
        _gram_buckets(docs.select(id_col, text_col), text_col, dim, bigrams)
        .groupBy(id_col, "__bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            id_col,
            F.col("__bucket").alias(
                "bucket", metadata={"dsir_dim": dim, "dsir_bigrams": bigrams}
            ),
            F.col("__n").alias("n"),
        )
    )


def _bucket_totals(
    docs: DataFrame, text_col: str, dim: int, bigrams: bool
) -> DataFrame:
    return (
        _gram_buckets(docs.select(text_col), text_col, dim, bigrams)
        .groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def fit_importance(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    *,
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    bigrams: bool = True,
    smoothing: float = 1.0,
) -> ImportanceModel:
    """Fit per-bucket log-likelihood ratios log p_target(b)/p_raw(b)
    with add-``smoothing`` Laplace priors.  ``target_docs`` is the
    (small) exemplar corpus, ``raw_docs`` the pool to be scored — per
    the paper, fit the raw side on the pool itself or any sample large
    enough to estimate bucket frequencies.

    When the target is a SUBSET of the pool (the common "select docs
    like these exemplars" setup), prefer :func:`fit_importance_subset`:
    both corpora's bucket totals come out of ONE gram explode instead
    of two."""
    t = _bucket_totals(target_docs, text_col, dim, bigrams)
    r = _bucket_totals(raw_docs, text_col, dim, bigrams)
    return _fit_from_bucket_counts(
        target_docs.sparkSession, t, r, dim=dim, bigrams=bigrams,
        smoothing=smoothing,
    )


def fit_importance_subset(
    docs: DataFrame,
    target_pred,
    *,
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    bigrams: bool = True,
    smoothing: float = 1.0,
    features: DataFrame | None = None,
    id_col: str = "doc_id",
) -> ImportanceModel:
    """Fit when the exemplar corpus is the subset of ``docs`` matching
    ``target_pred`` (a boolean Column) — the common "select more docs
    like these" setup.  One gram explode computes BOTH corpora's bucket
    totals (``count`` for the pool, ``count_if(pred)`` for the target),
    halving the fit's scan cost vs :func:`fit_importance`; the ratio
    math is identical, verified by the q41 oracle twin.

    ``features`` (a :func:`feature_counts` frame keyed by ``id_col``)
    short-circuits the gram explode: bucket totals fold the
    pre-aggregated per-document counts (``Σ n`` ≡ the occurrence
    count), with the subset flag attached by one id join.  Fit + score
    then share ONE explode over the raw text — materialize the frame
    (``localCheckpoint``) before passing it to both, otherwise each
    consumer recomputes the common subtree (Spark does not dedupe
    shared plan fragments within one query)."""
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (the prior keeps every "
                         "bucket's probability finite)")
    if features is not None:
        # refuse a features frame built under different hashing params
        # (ADVICE r12): feature_counts stamps (dim, bigrams) on the
        # bucket column; a mismatched dim would join buckets >= dim to
        # nothing at scoring and silently skew every ratio
        fmeta = dict(features.schema["bucket"].metadata or {})
        if fmeta.get("dsir_dim", dim) != dim or bool(
            fmeta.get("dsir_bigrams", bigrams)
        ) != bool(bigrams):
            raise ValueError(
                "features frame was built with dim="
                f"{fmeta.get('dsir_dim')}, bigrams={fmeta.get('dsir_bigrams')} "
                f"but fit_importance_subset was called with dim={dim}, "
                f"bigrams={bigrams} — rebuild feature_counts with matching "
                "parameters"
            )
        flags = docs.select(id_col, target_pred.alias("__is_t"))
        joint = (
            features.join(flags, id_col)
            .groupBy(F.col("bucket").alias("__bucket"))
            .agg(
                F.sum("n").alias("__rc"),
                F.sum(
                    F.when(F.col("__is_t"), F.col("n")).otherwise(F.lit(0))
                ).alias("__tc"),
            )
            # unstamped caller-built frames: in-plan range guard on the
            # AGGREGATED buckets (<= dim+stragglers rows — free), so an
            # out-of-range bucket fails the job instead of vanishing in
            # the range(dim) join below
            .withColumn(
                "__bucket",
                F.when(
                    (F.col("__bucket") >= 0) & (F.col("__bucket") < dim),
                    F.col("__bucket"),
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "fit_importance_subset: features bucket "
                            ),
                            F.col("__bucket").cast("string"),
                            F.lit(f" outside [0, {dim}) — dim mismatch"),
                        )
                    ).cast("int")
                ),
            )
        )
    else:
        g = _gram_buckets(
            docs.select(text_col, target_pred.alias("__is_t")),
            text_col, dim, bigrams,
        )
        joint = g.groupBy("__bucket").agg(
            F.count(F.lit(1)).alias("__rc"),
            F.count_if(F.col("__is_t")).alias("__tc"),
        )
    totals = joint.agg(
        F.coalesce(F.sum("__tc"), F.lit(0)).alias("__t_total"),
        F.coalesce(F.sum("__rc"), F.lit(0)).alias("__r_total"),
    )
    a = float(smoothing)
    ratios = (
        docs.sparkSession.range(dim)
        .select(F.col("id").cast("int").alias("bucket"))
        # joint is <= dim aggregated rows — structurally broadcastable,
        # and the hint matters because a features= caller may hand a
        # localCheckpointed frame whose size estimate defeats AQE
        .join(F.broadcast(joint), F.col("bucket") == F.col("__bucket"), "left")
        .drop("__bucket")
        .crossJoin(F.broadcast(totals))
        .select("bucket", _log_ratio_expr(a, dim))
    )
    return ImportanceModel(ratios=ratios, dim=dim, bigrams=bigrams, smoothing=a)


def _log_ratio_expr(a: float, dim: int):
    """log p_target(b)/p_raw(b) over columns __tc/__rc/__t_total/__r_total
    (Laplace-``a`` smoothed) — the one formula both fit paths share, so
    they can never drift apart."""
    return (
        F.log(
            (F.coalesce(F.col("__tc"), F.lit(0)) + F.lit(a))
            / (F.col("__t_total") + F.lit(a * dim))
        )
        - F.log(
            (F.coalesce(F.col("__rc"), F.lit(0)) + F.lit(a))
            / (F.col("__r_total") + F.lit(a * dim))
        )
    ).alias("log_ratio")


def _fit_from_bucket_counts(
    spark,
    t: DataFrame,
    r: DataFrame,
    *,
    dim: int,
    bigrams: bool,
    smoothing: float,
) -> ImportanceModel:
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (the prior keeps every "
                         "bucket's probability finite)")
    # corpus totals as broadcast scalar state (no driver collect)
    t_tot = t.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("__t_total"))
    r_tot = r.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("__r_total"))
    a = float(smoothing)
    ratios = (
        spark.range(dim)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(F.broadcast(t.withColumnRenamed("cnt", "__tc")), F.col("bucket") == F.col("__bucket"), "left")
        .drop("__bucket")
        .join(F.broadcast(r.withColumnRenamed("cnt", "__rc")), F.col("bucket") == F.col("__bucket"), "left")
        .drop("__bucket")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select("bucket", _log_ratio_expr(a, dim))
    )
    return ImportanceModel(ratios=ratios, dim=dim, bigrams=bigrams, smoothing=a)


def persist_importance_model(model: ImportanceModel, root: str):
    """Persist a fitted model as a versioned lakehouse table: the
    ``dim``-row ratio frame is the data, the fit hyper-parameters ride
    the table properties — so a model is one table a fleet of scoring
    jobs (batch or streaming) can broadcast-probe, refresh atomically
    (overwrite = one commit, readers pin their snapshot), and time
    travel like any other table.  Returns the :class:`ParquetTable`."""
    from azure_databricks_lakehouse_spark.sources.tables import (
        ParquetTable,
        is_table,
    )

    spark = model.ratios.sparkSession
    if is_table(root):
        t = ParquetTable.for_path(spark, root)
        t.overwrite(model.ratios)
    else:
        t = ParquetTable.create(spark, root, model.ratios)
    t.set_properties(
        {
            "dsir_dim": str(model.dim),
            "dsir_bigrams": str(bool(model.bigrams)).lower(),
            "dsir_smoothing": repr(model.smoothing),
        }
    )
    return t


def load_importance_model(spark, root: str) -> ImportanceModel:
    """Re-hydrate a model persisted by :func:`persist_importance_model`.
    The ratio frame reads the table's CURRENT snapshot lazily — a
    scoring job that loads per micro-batch picks up an atomically
    refreshed fit on its next batch."""
    from azure_databricks_lakehouse_spark.sources.tables import ParquetTable

    t = ParquetTable.for_path(spark, root)
    props = t.properties()
    try:
        dim = int(props["dsir_dim"])
        bigrams = props["dsir_bigrams"] == "true"
        smoothing = float(props["dsir_smoothing"])
    except KeyError as exc:
        raise ValueError(
            f"{root} is not a persisted ImportanceModel (missing "
            f"property {exc})"
        ) from None
    return ImportanceModel(
        ratios=t.read(), dim=dim, bigrams=bigrams, smoothing=smoothing
    )


def score_importance(
    docs: DataFrame,
    model: ImportanceModel,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "importance",
    features: DataFrame | None = None,
) -> DataFrame:
    """Per-document importance log-weight: Σ_b n_b · log_ratio(b).

    Documents with no tokens score 0 (the empty product — they are
    exactly as likely under either model).  The per-doc sum folds over
    bucket-sorted contributions, so the double is bit-identical
    regardless of partitioning or engine.  ``features`` short-circuits
    the gram explode with a precomputed :func:`feature_counts` frame
    (score several models over one corpus, or persist the counts once
    and reuse them across scoring batches)."""
    feats = features if features is not None else feature_counts(
        docs, id_col=id_col, text_col=text_col, dim=model.dim, bigrams=model.bigrams
    )
    scores = (
        feats.join(F.broadcast(model.ratios), "bucket")
        .withColumn("__c", F.col("n").cast("double") * F.col("log_ratio"))
        .groupBy(id_col)
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "__c"))),
                    lambda s: s["__c"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(out_col)
        )
    )
    return docs.join(scores, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0.0))
    )


def importance_resample(
    docs: DataFrame,
    model: ImportanceModel,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    features: DataFrame | None = None,
) -> DataFrame:
    """Select ``k`` documents ∝ exp(importance) without replacement —
    the Gumbel top-k equivalence (add independent Gumbel noise to each
    log-weight, take the k largest).  Deterministic for a given
    ``seed``: the noise is the md5 uniform of (id, seed), so the same
    call returns the same k rows on any cluster.  ``features`` as in
    :func:`score_importance`."""
    scored = score_importance(
        docs, model, id_col=id_col, text_col=text_col, out_col="importance",
        features=features,
    )
    u = md5_uniform01(F.col(id_col), seed)
    key = F.col("importance") + (-F.log(-F.log(u)))
    return (
        scored.withColumn("__gumbel_key", key)
        .orderBy(F.col("__gumbel_key").desc(), F.col(id_col))
        .limit(k)
        .drop("__gumbel_key")
    )
