"""Layer-1 pre-flight (SURVEY.md §5.2): every SQL-oracled key must
hash-match DuckDB at the driver's correctness scale factor, and every
rows-only key must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from engine.registry import all_oracles, all_queries

from .conftest import SF_ORACLE
from .oracle_utils import compare

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_match(key, spark, duck):
    df = QUERIES[key](spark, SF_ORACLE)
    compare(df, duck, ORACLES[key], key=key)


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(key, spark):
    df = QUERIES[key](spark, SF_ORACLE)
    assert df.columns, f"{key}: empty schema"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
