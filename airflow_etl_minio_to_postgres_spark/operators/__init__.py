from airflow_etl_minio_to_postgres_spark.operators.cleaning import (
    fill_nulls,
    nullify_empty,
    trim_lower_strings,
)
from airflow_etl_minio_to_postgres_spark.operators.keys import (
    add_hash_key,
    add_natural_key,
    assign_surrogate_ids,
    dedup_rows,
    resolve_key_to_id,
)

__all__ = [
    "trim_lower_strings",
    "nullify_empty",
    "fill_nulls",
    "add_natural_key",
    "add_hash_key",
    "dedup_rows",
    "assign_surrogate_ids",
    "resolve_key_to_id",
]
