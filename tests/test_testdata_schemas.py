"""Declared-vs-physical schema property test over the driver testdata.

``TESTDATA_SCHEMAS`` is trusted by every scan (schema-declared reads skip
inference), so a driver-side regeneration of the parquet files with
different physical types would otherwise corrupt silently — round 4's
nanos/micros timestamp incident was exactly this.  This test reads each
table's parquet FOOTER (pyarrow, no data pages) at every shipped scale
factor and asserts the declared Spark type is compatible with the physical
type, timestamp-unit-aware: a ``timestamp[ns]`` column is acceptable only
if the catalog's footer sniff (``nanos_ts_columns``) reports it, because
that is what triggers the long-read + div-1000 restore path.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from airflow_etl_minio_to_postgres_spark.schemas import TESTDATA_SCHEMAS
from airflow_etl_minio_to_postgres_spark.sources.catalog import nanos_ts_columns

SF_DIRS = [
    f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")
]


def _footer_schema(path: str) -> pa.Schema:
    if os.path.isdir(path):
        parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        assert parts, f"no parquet part files under {path}"
        path = os.path.join(path, parts[0])
    return pq.read_schema(path)


def _compatible(declared: T.DataType, physical: pa.DataType) -> bool:
    """Non-timestamp compatibility between a declared Spark type and the
    parquet physical type (timestamps are asserted separately, unit-aware).
    """
    if isinstance(declared, T.LongType):
        return pa.types.is_int64(physical)
    if isinstance(declared, T.IntegerType):
        return pa.types.is_int32(physical)
    if isinstance(declared, T.DoubleType):
        return pa.types.is_float64(physical)
    if isinstance(declared, T.StringType):
        return pa.types.is_string(physical) or pa.types.is_large_string(physical)
    if isinstance(declared, T.ArrayType):
        return (
            pa.types.is_list(physical) or pa.types.is_large_list(physical)
        ) and _compatible(declared.elementType, physical.value_type)
    if isinstance(declared, T.FloatType):
        return pa.types.is_float32(physical)
    if isinstance(declared, T.TimestampType):
        return pa.types.is_timestamp(physical)
    raise AssertionError(f"unmapped declared type {declared}")


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
@pytest.mark.parametrize("table", sorted(TESTDATA_SCHEMAS))
def test_declared_schema_matches_footer(sf_dir: str, table: str) -> None:
    path = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} not generated")
    physical = _footer_schema(path)
    declared = TESTDATA_SCHEMAS[table]

    assert [f.name for f in declared.fields] == physical.names, (
        f"{table}@{sf_dir}: column names/order drifted"
    )
    sniffed_nanos = nanos_ts_columns(path, table)
    for field in declared.fields:
        phys = physical.field(field.name).type
        assert _compatible(field.dataType, phys), (
            f"{table}.{field.name}@{sf_dir}: declared {field.dataType} "
            f"vs physical {phys}"
        )
        if isinstance(field.dataType, T.TimestampType):
            if phys.unit == "ns":
                assert field.name in sniffed_nanos, (
                    f"{table}.{field.name}@{sf_dir}: physical timestamp[ns] "
                    "but the catalog footer sniff missed it — scans would "
                    "fail or corrupt"
                )
            else:
                assert field.name not in sniffed_nanos, (
                    f"{table}.{field.name}@{sf_dir}: physical "
                    f"timestamp[{phys.unit}] but the catalog would apply "
                    "the nanos div-1000 restore — values would be wrong"
                )
