from azure_databricks_lakehouse_spark.functions.numeric import dec_sum, dec_sum_sql, safe_avg, safe_avg_sql

__all__ = ["dec_sum", "dec_sum_sql", "safe_avg", "safe_avg_sql"]
