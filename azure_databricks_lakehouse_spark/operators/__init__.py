from azure_databricks_lakehouse_spark.operators.dedup import keep_latest, latest_by
from azure_databricks_lakehouse_spark.operators.dims import (
    add_surrogate_key,
    build_date_dim,
    date_key_expr,
    month_name_expr,
)
from azure_databricks_lakehouse_spark.operators.dq import (
    Rule,
    apply_rules,
    completeness,
    split_by_status,
)
from azure_databricks_lakehouse_spark.operators.lm import (
    NgramLM,
    score_perplexity,
    train_ngram_lm,
)
from azure_databricks_lakehouse_spark.operators.mixture import (
    MixturePlan,
    mix_corpus,
    plan_mixture,
    realize_mixture,
)
from azure_databricks_lakehouse_spark.operators.chunking import (
    chunk_documents,
)
from azure_databricks_lakehouse_spark.operators.linedup import (
    remove_duplicate_lines,
    repeated_lines,
)
from azure_databricks_lakehouse_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    rrf_fuse,
)
from azure_databricks_lakehouse_spark.operators.spandup import (
    remove_repeated_spans,
    repeated_span_windows,
)
from azure_databricks_lakehouse_spark.operators.urlfilter import (
    UrlFilterResult,
    filter_urls,
    host_suffixes,
    url_parts,
)
from azure_databricks_lakehouse_spark.operators.semdedup import (
    SemDedupResult,
    semantic_dedup,
)
from azure_databricks_lakehouse_spark.operators.pq import (
    PQCodebook,
    ivfpq_search,
    pq_encode,
    pq_search,
    train_pq,
)

__all__ = [
    "UrlFilterResult",
    "filter_urls",
    "host_suffixes",
    "url_parts",
    "SemDedupResult",
    "semantic_dedup",
    "Rule",
    "apply_rules",
    "completeness",
    "split_by_status",
    "keep_latest",
    "latest_by",
    "add_surrogate_key",
    "build_date_dim",
    "date_key_expr",
    "month_name_expr",
    "NgramLM",
    "train_ngram_lm",
    "score_perplexity",
    "MixturePlan",
    "plan_mixture",
    "realize_mixture",
    "mix_corpus",
    "PQCodebook",
    "train_pq",
    "pq_encode",
    "pq_search",
    "ivfpq_search",
    "chunk_documents",
    "remove_duplicate_lines",
    "remove_repeated_spans",
    "repeated_span_windows",
    "bm25_scores",
    "bm25_topk",
    "rrf_fuse",
    "repeated_lines",
]
