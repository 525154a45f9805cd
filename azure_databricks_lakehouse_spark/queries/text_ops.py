"""Text-analysis operators over the ``documents`` table (LLM-pipeline
surface: tokenization, language ID, quality scoring, token counting).

These are the operations a large-scale training-data pipeline runs over
raw text before dedup/filtering.  Everything is built-in Catalyst
expressions — ``split`` / higher-order array functions / ``explode`` — no
Python UDFs, so the whole stage is codegen'd and Arrow never enters the
picture (SURVEY.md §2.10 stance extended to the text surface).

Scale notes: per-document scoring (q24/q25) is a pure projection — zero
shuffle, scales linearly with input splits.  The corpus-wide token
frequency (q26) is explode → two-level hash aggregate; Spark plans a
partial (map-side) count before the single shuffle on token, so wire
volume is the vocabulary size per partition, not the token stream.  Top-k
is ``TakeOrderedAndProject`` — no global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.queries import QuerySpec
from azure_databricks_lakehouse_spark.sources.catalog import bind

# Tiny English stopword list for the n-gram-free language heuristic: the
# ratio of stopword tokens is a strong en/other separator on whitespace
# languages (classic heuristic; no external model).
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

_TOKENS = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
_TOKENS_SQL = "string_split_regex(trim(lower(text)), '\\s+')"


# --- q24: tokenization + token counting (per-document stats) ---------------
def q24_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "documents")
    toks = _TOKENS
    n_tokens = F.size(toks)
    compact_len = F.length(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", ""))
    return t["documents"].select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        (compact_len / n_tokens).alias("avg_token_len"),
    )


_Q24_SQL = f"""
SELECT doc_id,
       n_chars,
       len({_TOKENS_SQL}) AS n_tokens,
       len(list_distinct({_TOKENS_SQL})) AS n_types,
       length(regexp_replace(trim(lower(text)), '\\s+', '', 'g'))
         / len({_TOKENS_SQL}) AS avg_token_len
FROM documents
"""


# --- q25: language-ID heuristic + quality scoring --------------------------
def q25_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "documents")
    toks = _TOKENS
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    stop_ratio = n_stop / n_tokens
    return t["documents"].select(
        "doc_id",
        "lang",
        stop_ratio.alias("stop_ratio"),
        (stop_ratio >= 0.05).alias("pred_en"),
        ((stop_ratio >= 0.05) == (F.col("lang") == "en")).alias("pred_correct"),
        (n_tokens >= 30).alias("len_ok"),
        ((F.col("n_chars") / n_tokens) <= 12.0).alias("token_len_ok"),
    )


_Q25_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         len({_TOKENS_SQL}) AS n_tokens,
         len(list_filter({_TOKENS_SQL},
             t -> t IN ({', '.join("'" + s + "'" for s in _STOPWORDS)}))) AS n_stop
  FROM documents
)
SELECT doc_id,
       lang,
       n_stop / CAST(n_tokens AS DOUBLE) AS stop_ratio,
       n_stop / CAST(n_tokens AS DOUBLE) >= 0.05 AS pred_en,
       (n_stop / CAST(n_tokens AS DOUBLE) >= 0.05) = (lang = 'en') AS pred_correct,
       n_tokens >= 30 AS len_ok,
       n_chars / CAST(n_tokens AS DOUBLE) <= 12.0 AS token_len_ok
FROM scored
"""


# --- q26: corpus token frequency top-k (explode + two-level agg) -----------
def q26_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = bind(spark, sf_dir, "documents")
    return (
        t["documents"]
        .select(F.explode(_TOKENS).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(50)
    )


_Q26_SQL = f"""
WITH exploded AS (SELECT unnest({_TOKENS_SQL}) AS token FROM documents)
SELECT token, COUNT(*) AS n_occurrences
FROM exploded
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 50
"""


QUERIES: dict[str, QuerySpec] = {
    "q24_doc_token_stats": QuerySpec(q24_doc_token_stats, _Q24_SQL),
    "q25_lang_quality": QuerySpec(q25_lang_quality, _Q25_SQL),
    "q26_token_frequency": QuerySpec(q26_token_frequency, _Q26_SQL),
}
