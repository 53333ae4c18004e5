"""Driver-compare sortability guard.

The external gate sorts result rows as raw Python tuples; a NULL and a
non-NULL meeting at the first differing position raises TypeError and
crashes the whole comparison (found via q58's NULL group in r6). Pin
the invariant for every registered oracle: its result set must be
tuple-sortable. Queries that legitimately emit NULLs stay safe only
while an earlier unique column short-circuits the comparison — this
test fails the moment a registry change breaks that."""

from __future__ import annotations

import duckdb
import pytest

import sqlondataframesr_spark.registry as registry

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    for t in _TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(registry.oracles()))
def test_oracle_rows_are_tuple_sortable(con, name):
    cur = con.execute(registry.oracles()[name])
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(r[i] for i in order) for r in cur.fetchall()]
    sorted(rows)  # TypeError here = the driver compare would crash
