from azure_databricks_lakehouse_spark.streaming.jobs import (
    dedup_stream,
    read_file_stream,
    read_rate_stream,
    read_table_stream,
    tumbling_counts,
    write_deduped_stream,
    write_importance_screened_stream,
    write_stream_to_table,
)

__all__ = [
    "read_file_stream",
    "read_rate_stream",
    "read_table_stream",
    "tumbling_counts",
    "dedup_stream",
    "write_deduped_stream",
    "write_importance_screened_stream",
    "write_stream_to_table",
]
