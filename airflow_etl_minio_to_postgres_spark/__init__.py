"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference medallion ETL
(jacobjoe/airflow-etl-minio-to-postgres), rebuilt Spark-first.

Layout:
    session      - SparkSession factory tuned for local[32] and cluster scale
    schemas      - explicit StructType registry for every table the engine touches
    naming       - column-name standardization (camel/mixed -> snake_case)
    operators/   - cleaning, key-generation (natural/hash/surrogate ids),
                   metadata-driven normalization
    functions/   - LLM-pipeline operators: text analysis, exact/MinHash-LSH/
                   SimHash dedup, cosine + sign-LSH similarity search,
                   multimodal payload plumbing (Arrow-batched mapInPandas)
    sources/     - catalog (parquet test tables), CSV/Excel/parquet files
                   with extension dispatch, JDBC read/write + DDL emission
    plans/       - the medallion pipeline (bronze -> silver -> gold) as a
                   declarative driver program
    streaming/   - Structured Streaming: watermarked windowed aggregation and
                   applyInPandasWithState stateful operators over events
"""

from airflow_etl_minio_to_postgres_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
