from airflow_etl_minio_to_postgres_spark.plans.medallion import (
    build_gold,
    build_silver,
    run_medallion,
)

__all__ = ["build_silver", "build_gold", "run_medallion"]
