"""Driver-contract gate: every queries()[k] must match its oracle_sql()[k]
on DuckDB at sf0.001 (the driver runs the same comparison at sf0.01)."""

import pytest

from . import oracle_harness

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    return oracle_harness.compare(spark, SF_DIR)


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    assert set(e.oracle_sql()) <= set(e.queries())


def test_all_queries_clean(results):
    bad = {k: v for k, v in results.items() if not v.startswith(("OK", "ROWS_ONLY"))}
    assert not bad, f"oracle mismatches: {bad}"


def test_oracle_coverage():
    import __spark_entry__ as e

    # SQL-expressible operators must carry an oracle; rows-only is the
    # exception, not the rule
    n_total = len(e.queries())
    n_oracled = len(e.oracle_sql())
    assert n_oracled >= 0.8 * n_total
