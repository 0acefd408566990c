"""Arrow-batched per-group Python (``applyInPandas``) — the extension point
for group-local logic that has no Spark expression (tokenizer training,
per-source quality models, custom samplers).

Rules of the road at 100 TB: one shuffle on the group key, each group's
rows arrive as ONE pandas frame on an executor — so groups must fit in
executor memory (salt or pre-aggregate skewed groups first), and the Python
boundary is paid once per group, not per row.  Everything expressible as
built-in expressions should stay out of here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def per_group_counts_pandas(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group value-distribution counts, computed by pandas inside the
    group (batch sibling of ``streaming.stateful_user_counts``).  Integer
    outputs only, so the demo stays bit-reproducible in SQL.
    """
    out_schema = T.StructType(
        [
            T.StructField(group_col, T.LongType()),
            T.StructField(value_col, T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def _counts(pdf: pd.DataFrame) -> pd.DataFrame:
        counted = (
            pdf.groupby(value_col, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        counted.insert(0, group_col, pdf[group_col].iloc[0])
        return counted

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        _counts, schema=out_schema
    )
