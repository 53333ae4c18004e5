"""Oracle output-type exactness gate (VERDICT r4 item 2).

The external driver hashes each oracle cell *with its declared type*,
so a DuckDB HUGEINT (bare ``SUM(INTEGER)``, ``count_if``) or DECIMAL
hashes differently from Spark's BIGINT/DOUBLE even at equal values —
rows/schema match, hash fails, and the repr-compare sim can't see it
(that exact gap burned se_task2/se_task5/q45 in round 4). These tests
(a) prove the checker rejects the dangerous types and (b) sweep every
registered oracle so a new bare SUM can never ship again.

No SparkSession needed — DuckDB plans each query without executing it.
"""

from __future__ import annotations

import duckdb
import pytest

from sqlondataframesr_spark.check import (
    ORACLE_TYPE_WHITELIST,
    duckdb_connect,
    oracle_type_violations,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_DIR)
    yield c
    c.close()


def test_rejects_bare_sum_hugeint(con):
    # DuckDB: SUM(INTEGER) -> HUGEINT. The driver would hash-fail this.
    bad = oracle_type_violations(
        con, "SELECT l_returnflag, SUM(l_linenumber) AS s FROM lineitem GROUP BY 1"
    )
    assert bad == [("s", "HUGEINT")]


def test_rejects_count_if_hugeint(con):
    bad = oracle_type_violations(
        con, "SELECT count_if(l_quantity > 40) AS n FROM lineitem"
    )
    assert bad == [("n", "HUGEINT")]


def test_rejects_decimal(con):
    bad = oracle_type_violations(
        con, "SELECT CAST(1 AS DECIMAL(10,2)) AS d"
    )
    assert bad and bad[0][0] == "d" and bad[0][1].startswith("DECIMAL")


def test_accepts_cast_sum(con):
    assert not oracle_type_violations(
        con,
        "SELECT l_returnflag, CAST(SUM(l_linenumber) AS BIGINT) AS s "
        "FROM lineitem GROUP BY 1",
    )


def test_whitelist_excludes_known_hazards():
    assert "HUGEINT" not in ORACLE_TYPE_WHITELIST
    assert "DECIMAL" not in ORACLE_TYPE_WHITELIST


def test_all_registered_oracles_are_type_clean(con):
    """Sweep every oracle_sql() entry — zero exotic output types."""
    import __spark_entry__ as entry

    violations = {}
    for name, sql in sorted(entry.oracle_sql().items()):
        bad = oracle_type_violations(con, sql)
        if bad:
            violations[name] = bad
    assert not violations, f"oracles with non-whitelisted output types: {violations}"
