"""standardize / normalize_filename edge cases (FIXTURES.md §A1 headers,
reference rule at dags/dag_etl_minio_to_postgres.py:72-84)."""

from __future__ import annotations

import pytest

from airflow_etl_minio_to_postgres_spark.naming import (
    normalize_filename,
    standardize,
    standardize_columns,
)


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("Property_Title", "property_title"),
        ("BasementYesNo", "basement_yes_no"),
        ("SQFT_Basement", "sqft_basement"),
        ("SQFT_MU", "sqft_mu"),
        ("HOA_Flag", "hoa_flag"),
        ("HOA", "hoa"),
        ("IRR", "irr"),
        ("Zip", "zip"),
        ("Neighborhood_Rating", "neighborhood_rating"),
        ("Seller_Retained_Broker", "seller_retained_broker"),
        ("already_snake", "already_snake"),
        ("x", "x"),
        ("", ""),
    ],
)
def test_standardize(raw, expected):
    assert standardize(raw) == expected


def test_standardize_columns_renames_all(spark):
    df = spark.createDataFrame([(1, "a")], ["Property_Title", "HOA_Flag"])
    assert standardize_columns(df).columns == ["property_title", "hoa_flag"]


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("Fake Data.csv", "fake_data.csv"),
        ("Field Config.xlsx", "field_config.xlsx"),
        ("simple.csv", "simple.csv"),
    ],
)
def test_normalize_filename(raw, expected):
    assert normalize_filename(raw) == expected
