"""JDBC source/sink — partitioned reads, batched writes, exact-DDL emission.

Reference surface (``dags/dag_etl_minio_to_postgres.py``):

* S6 ``postgres_table_creation`` (``:110-121``): ``CREATE SCHEMA IF NOT
  EXISTS`` + hand-written ``CREATE TABLE`` in one transaction.  Spark's JDBC
  writer cannot express schemas/PK/FK/UNIQUE, so :func:`create_table_sql` /
  :func:`create_schema_sql` emit the exact DDL and :func:`execute_ddl` runs
  it over a plain driver connection (any DB-API module, e.g. psycopg2) —
  once, before the distributed write.
* S7 ``push_to_postgres`` (``:125-138``): a ~300-400 rows/s per-row INSERT
  loop — replaced by ``format("jdbc")`` with ``batchsize`` +
  ``reWriteBatchedInserts``, one connection per partition writing in
  parallel.
* S9 ``read_postgres`` (``:142-148``): full single-threaded ``SELECT *`` —
  replaced by a partitioned read (``partitionColumn/lowerBound/upperBound/
  numPartitions``) so a 1000-executor cluster scans ranges concurrently.

Option construction is split into pure functions so correctness tests cover
the exact option dicts without a database in the loop; tests run against
parquet stand-ins (TESTDATA.md) and a live Postgres only needs the JDBC jar
on the classpath (``spark.jars``).

At 100 TB Postgres is a *serving* sink, never the warehouse (SURVEY.md §7
hard-part 5): the engine-native store is parquet, and JDBC writes are
repartitioned down to a connection count the database can absorb.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass(frozen=True)
class JdbcConfig:
    """Connection config (reference reads it from Airflow env/config,
    ``dags/dag_etl_minio_to_postgres.py:15-20``)."""

    url: str  # e.g. jdbc:postgresql://host:5432/db
    user: str
    password: str
    driver: str = "org.postgresql.Driver"

    def base_options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
        }


def read_options(
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Options for a (optionally partitioned) JDBC scan (S9)."""
    opts = cfg.base_options() | {"dbtable": table, "fetchsize": str(fetchsize)}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC read needs partition_column, lower_bound, "
                "upper_bound and num_partitions together"
            )
        opts |= {
            "partitionColumn": partition_column,
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
            "numPartitions": str(num_partitions),
        }
    return opts


def write_options(
    cfg: JdbcConfig,
    table: str,
    batchsize: int = 10_000,
    rewrite_batched_inserts: bool = True,
    truncate: bool = False,
    create_table_column_types: str | None = None,
) -> dict[str, str]:
    """Options for a batched JDBC write (S7).  ``reWriteBatchedInserts``
    turns executemany into multi-row INSERTs on the Postgres driver —
    orders of magnitude past the reference's row loop."""
    opts = cfg.base_options() | {
        "dbtable": table,
        "batchsize": str(batchsize),
        "truncate": str(truncate).lower(),
    }
    if rewrite_batched_inserts and "postgresql" in cfg.url:
        opts["url"] = _with_url_param(cfg.url, "reWriteBatchedInserts", "true")
    if create_table_column_types:
        opts["createTableColumnTypes"] = create_table_column_types
    return opts


def _with_url_param(url: str, key: str, value: str) -> str:
    sep = "&" if "?" in url else "?"
    return url if f"{key}=" in url else f"{url}{sep}{key}={value}"


def derby_config(db_path: str) -> JdbcConfig:
    """Config for the Apache Derby *embedded* database that ships in the
    Spark distribution's jars — a real JDBC store with zero external
    dependencies, so the S7 write / S9 read paths can be exercised live
    (rows actually traveling through SQL) in environments without Postgres.
    Embedded Derby ignores credentials by default; the same config shape
    swaps to Postgres by changing url+driver only."""
    return JdbcConfig(
        url=f"jdbc:derby:{db_path};create=true",
        user="app",
        password="app",
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
    )


def dbapi_over_jvm(spark: SparkSession, url: str):
    """A minimal DB-API-shaped connection factory over the driver JVM's
    ``java.sql.DriverManager`` (py4j), so :func:`execute_ddl` can run
    against any JDBC database on the classpath without a Python driver.
    Driver-side only, DDL-sized statements only — never for data."""

    class _Cursor:
        def __init__(self, conn):
            self._conn = conn

        def execute(self, stmt: str) -> None:
            st = self._conn.createStatement()
            try:
                st.execute(stmt)
            finally:
                st.close()

    class _Conn:
        def __init__(self, jconn):
            self._jconn = jconn

        def cursor(self) -> _Cursor:
            return _Cursor(self._jconn)

        def commit(self) -> None:
            if not self._jconn.getAutoCommit():
                self._jconn.commit()

        def close(self) -> None:
            self._jconn.close()

    jvm = spark.sparkContext._jvm
    return lambda: _Conn(jvm.java.sql.DriverManager.getConnection(url))


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    **partition_kwargs,
) -> DataFrame:
    """S9: ``SELECT * FROM table`` as a (partitioned) distributed scan."""
    return (
        spark.read.format("jdbc")
        .options(**read_options(cfg, table, **partition_kwargs))
        .load()
    )


def write_table(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    mode: str = "append",
    max_connections: int | None = None,
    **write_kwargs,
) -> None:
    """S7: batched parallel JDBC write.  ``max_connections`` caps concurrent
    connections (one per partition) so a wide cluster doesn't DoS the
    database — repartition down, never up."""
    out = df
    if max_connections is not None and df.rdd.getNumPartitions() > max_connections:
        out = df.coalesce(max_connections)
    (
        out.write.format("jdbc")
        .options(**write_options(cfg, table, **write_kwargs))
        .mode(mode)
        .save()
    )


# ---------------------------------------------------------------------------
# S6: exact DDL emission (schemas / PK / UNIQUE / FK are not expressible
# through Spark's JDBC writer).
# ---------------------------------------------------------------------------

_SPARK_TO_PG: list[tuple[type, str]] = [
    (T.StringType, "TEXT"),
    (T.IntegerType, "INTEGER"),
    (T.LongType, "BIGINT"),
    (T.ShortType, "SMALLINT"),
    (T.DoubleType, "DOUBLE PRECISION"),
    (T.FloatType, "REAL"),
    (T.BooleanType, "BOOLEAN"),
    (T.DateType, "DATE"),
    (T.TimestampType, "TIMESTAMP"),
    (T.BinaryType, "BYTEA"),
]


def pg_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"NUMERIC({dt.precision},{dt.scale})"
    for spark_t, pg in _SPARK_TO_PG:
        if isinstance(dt, spark_t):
            return pg
    raise ValueError(f"no Postgres mapping for Spark type {dt}")


def create_schema_sql(schema_name: str) -> str:
    return f'CREATE SCHEMA IF NOT EXISTS "{schema_name}"'


def create_table_sql(
    struct: T.StructType,
    table: str,
    schema_name: str | None = None,
    serial_id: str | None = None,
    unique: list[str] | None = None,
    foreign_keys: dict[str, str] | None = None,
    if_not_exists: bool = True,
) -> str:
    """Emit the reference-style CREATE TABLE (``:413-551``): optional
    ``SERIAL PRIMARY KEY`` surrogate id, UNIQUE hash keys, FK references.
    Unlike the reference's gold DDL (``:414,423,431``) this defaults to
    ``IF NOT EXISTS`` so reruns are idempotent (SURVEY.md §7 hard-part 4)."""
    cols: list[str] = []
    if serial_id:
        cols.append(f'"{serial_id}" SERIAL PRIMARY KEY')
    for f in struct.fields:
        line = f'"{f.name}" {pg_type(f.dataType)}'
        if unique and f.name in unique:
            line += " UNIQUE"
        cols.append(line)
    for col, ref in (foreign_keys or {}).items():
        cols.append(f'FOREIGN KEY ("{col}") REFERENCES {ref}')
    qualified = f'"{schema_name}"."{table}"' if schema_name else f'"{table}"'
    ine = "IF NOT EXISTS " if if_not_exists else ""
    return f"CREATE TABLE {ine}{qualified} (\n    " + ",\n    ".join(cols) + "\n)"


def execute_ddl(connect, statements: list[str]) -> None:
    """Run DDL over a plain DB-API connection factory (one txn, reference
    ``:110-121``).  ``connect`` is e.g. ``lambda: psycopg2.connect(...)`` —
    injected so the engine has no hard driver dependency."""
    conn = connect()
    try:
        cur = conn.cursor()
        for stmt in statements:
            cur.execute(stmt)
        conn.commit()
    finally:
        conn.close()
