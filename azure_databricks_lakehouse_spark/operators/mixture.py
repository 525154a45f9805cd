"""Temperature-weighted domain mixing for training corpora, zero-UDF.

The reweighting step between dedup and packing in every modern
pretraining pipeline (GPT-3, The Pile, LLaMA): the raw corpus is wildly
skewed toward a few domains (web crawl dwarfs books dwarfs code), so
each domain d with n_d documents is sampled with probability
p_d ∝ n_d^α — α = 1 keeps natural proportions, α → 0 flattens toward
uniform, and high-value small domains end up seen MORE than once
(epochs > 1) while the crawl is downsampled.

Spark-first shape:

- **Planning is metadata**: one ``groupBy(domain).count()`` (domains
  number dozens, not millions) and closed-form driver math produce the
  per-domain rate table — exactly the scalar work every published
  mixture recipe does.
- **Realization is one projection**: every row's epoch count is
  ``floor(rate) + (hash < frac(rate))`` from the deterministic
  md5-bucket primitive (`functions/hashing`) — reproducible across
  runs, reshuffles, and engines, no RNG state, no shuffle.  Upsampled
  rows are replicated via ``explode(sequence(...))`` with an
  ``_epoch`` tag so downstream shuffling treats copies as distinct
  examples; downsampled rows keep/drop on their own hash.  Cost:
  cheap map-side work ∝ OUTPUT size.

The deterministic hash sampler means the realized proportions converge
to the plan at corpus scale (law of large numbers over hash buckets);
tests assert tolerance at small n.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.functions.hashing import hex_nibble


@dataclass(frozen=True)
class MixturePlan:
    """Per-domain sampling plan: ``rates[d]`` is the expected number of
    epochs (copies) of each domain-d document; ``target_rows`` the
    expected output size; ``excluded`` the corpus domains an explicit
    ``weights`` table left out (rate 0 — present only when the caller
    opted into ``allow_unlisted``)."""

    rates: dict
    counts: dict
    target_rows: float
    excluded: tuple = ()


def _uniform01(col: Column, seed: int) -> Column:
    """Deterministic uniform [0,1) from 6 md5 nibbles of (id, seed) —
    ~16.7M distinct levels, reproducible everywhere."""
    h = F.md5(F.concat(col.cast("string"), F.lit(f"#{seed}")))
    u = F.lit(0)
    for i in range(1, 7):
        u = u * 16 + hex_nibble(h, i)
    return u.cast("double") / F.lit(float(16**6))


def plan_mixture(
    docs: DataFrame,
    domain_col: str,
    *,
    temperature: float = 1.0,
    target_rows: int | None = None,
    max_epochs: float = 10.0,
    weights: dict | None = None,
    allow_unlisted: bool = False,
) -> MixturePlan:
    """Compute per-domain epoch rates.

    ``temperature`` is the α in p_d ∝ n_d^α (1 = natural, 0 = uniform).
    ``weights`` overrides the power law with explicit relative weights
    (un-normalized; e.g. the published LLaMA table).  A weights table
    that omits domains PRESENT in the corpus raises — a partial table
    would silently delete whole domains from the training mix; pass
    ``allow_unlisted=True`` to exclude them deliberately (they are
    surfaced in ``plan.excluded``).  ``target_rows`` sets the expected
    output size (defaults to the input size — pure reweighting).
    ``max_epochs`` caps repetition of tiny domains (the guard every
    recipe applies: a 100-doc domain must not be repeated thousands of
    times into memorization)."""
    counts = {
        r[domain_col]: r["n"]
        for r in docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return MixturePlan(rates={}, counts={}, target_rows=0.0)
    total = sum(counts.values())
    t = float(target_rows) if target_rows is not None else float(total)
    excluded: tuple = ()
    if weights is not None:
        unknown = set(weights) - set(counts)
        if unknown:
            raise ValueError(f"weights for absent domains: {sorted(unknown)}")
        unlisted = set(counts) - set(weights)
        if unlisted:
            if not allow_unlisted:
                raise ValueError(
                    "corpus domains missing from the weights table "
                    f"(would be silently dropped): {sorted(map(str, unlisted))}; "
                    "list them or pass allow_unlisted=True to exclude "
                    "them deliberately"
                )
            excluded = tuple(sorted(unlisted, key=str))
        raw = {d: float(weights.get(d, 0.0)) for d in counts}
    else:
        raw = {d: float(n) ** temperature for d, n in counts.items()}
    z = sum(raw.values())
    if z <= 0:
        raise ValueError("mixture weights sum to zero")
    rates = {}
    for d, n in counts.items():
        p = raw[d] / z
        rates[d] = min(p * t / n, float(max_epochs))
    expected = sum(rates[d] * counts[d] for d in counts)
    return MixturePlan(
        rates=rates, counts=counts, target_rows=expected, excluded=excluded
    )


def realize_mixture(
    docs: DataFrame,
    plan: MixturePlan,
    domain_col: str,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Apply a mixture plan: returns the input columns plus ``_epoch``
    (1-based copy index — distinct per replica so downstream shuffles
    treat copies as separate examples).  Deterministic in (id, seed);
    one projection + explode, no shuffle, no RNG state."""
    if not plan.rates:
        return docs.withColumn("_epoch", F.lit(1)).limit(0)
    rate = F.lit(None).cast("double")
    # build the rate lookup as a CASE chain — domains are metadata-sized
    expr = None
    for d, r in sorted(plan.rates.items(), key=lambda kv: str(kv[0])):
        cond = (
            F.col(domain_col).isNull()
            if d is None
            else (F.col(domain_col) == F.lit(d))
        )
        expr = F.when(cond, F.lit(r)) if expr is None else expr.when(cond, F.lit(r))
    rate = expr.otherwise(F.lit(0.0))
    u = _uniform01(F.col(id_col), seed)
    epochs = F.floor(rate).cast("int") + (
        u < (rate - F.floor(rate))
    ).cast("int")
    return (
        docs.withColumn("__n", epochs)
        .filter(F.col("__n") > 0)
        .withColumn("_epoch", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


def mix_corpus(
    docs: DataFrame,
    domain_col: str,
    *,
    id_col: str = "doc_id",
    temperature: float = 1.0,
    target_rows: int | None = None,
    max_epochs: float = 10.0,
    weights: dict | None = None,
    allow_unlisted: bool = False,
    seed: int = 0,
) -> tuple[DataFrame, MixturePlan]:
    """Plan + realize in one call; returns ``(mixed_df, plan)``."""
    plan = plan_mixture(
        docs,
        domain_col,
        temperature=temperature,
        target_rows=target_rows,
        max_epochs=max_epochs,
        weights=weights,
        allow_unlisted=allow_unlisted,
    )
    return realize_mixture(docs, plan, domain_col, id_col=id_col, seed=seed), plan
