"""Column/file-name normalization helpers.

Reimplements the reference's naming rules (reference:
``dags/dag_etl_minio_to_postgres.py:72-84`` for column standardization,
``:60`` for object-key normalization) as pure driver-side functions — these
run over *names*, never over data, so they cost nothing at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def standardize(name: str) -> str:
    """camel/mixed case -> snake_case.

    Rule (reference ``dags/dag_etl_minio_to_postgres.py:72-84``): insert ``_``
    before an uppercase letter whose predecessor is neither uppercase nor
    ``_``, then lowercase, strip, and drop spaces.

    >>> standardize("Property_Title")
    'property_title'
    >>> standardize("BasementYesNo")
    'basement_yes_no'
    >>> standardize("SQFT_Basement")
    'sqft_basement'
    >>> standardize("HOA_Flag")
    'hoa_flag'
    """
    out: list[str] = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0:
            prev = name[i - 1]
            if not prev.isupper() and prev != "_":
                out.append("_")
        out.append(ch)
    return "".join(out).lower().strip().replace(" ", "")


def standardize_columns(df: DataFrame) -> DataFrame:
    """Rename every column of ``df`` with :func:`standardize`.

    Metadata-only (``toDF`` is a projection rename): zero cluster work.
    """
    return df.toDF(*[standardize(c) for c in df.columns])


def normalize_filename(name: str) -> str:
    """lower + spaces->underscores, as the reference applies to object keys
    (``dags/dag_etl_minio_to_postgres.py:60``)."""
    return name.lower().replace(" ", "_")
