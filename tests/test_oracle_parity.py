"""Every registered query must hash-match its DuckDB oracle (driver t2 twin).

Runs at sf0.001 by default (fast); set ORACLE_SF_DIR=/root/testdata/sf0.01 to
replicate the driver's exact scale.
"""

from __future__ import annotations

import os

import pytest

from watermill_spark.analytics.registry import REGISTRY

from .oracle_harness import compare, duck_connect

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, driver-equivalent
        return
    report = compare(df, duck, q.oracle)
    assert report["ok"], f"{name}: {report['detail']} ({report['spark_rows']} vs {report['duck_rows']} rows)"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracles = e.oracle_sql()
    assert set(oracles) <= names
