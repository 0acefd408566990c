"""Every queries() entry with an oracle must match DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tests.oracle import compare, duckdb_con


def _query_names():
    return sorted(entry_mod.queries().keys())


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_SMOKE)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # driver contract: entry() must produce rows
    assert df.columns


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    sdf = q(spark, SF_SMOKE)
    assert sdf is not None
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only check, mirroring the driver
        return
    odf = con.execute(oracles[name]).df()
    issues = compare(sdf, odf)
    assert not issues, f"{name}: " + "; ".join(issues[:5])
