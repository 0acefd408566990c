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


def test_standardize_matches_reference_rule_property():
    """Property parity with the reference rule (SURVEY §1.3, reference
    dags/dag_etl_minio_to_postgres.py:72-84): insert '_' before an
    uppercase letter whose predecessor is neither uppercase nor '_',
    then lowercase, strip, drop spaces.  Checked against an independent
    spec-level re-derivation over adversarial alphabets (unlike the
    reference, ours must also survive the empty string)."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    def spec(word: str) -> str:
        if not word:
            return ""
        out = [word[0]]
        for prev, ch in zip(word, word[1:]):
            if ch.isupper() and not (prev.isupper() or prev == "_"):
                out.append("_")
            out.append(ch)
        return "".join(out).lower().strip().replace(" ", "")

    @given(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"),
                whitelist_characters="_ -",
            ),
            max_size=24,
        )
    )
    @settings(max_examples=300, deadline=None)
    def check(word):
        assert standardize(word) == spec(word)

    check()
