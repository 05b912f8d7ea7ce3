"""Driver-contract hygiene: every oracle key has a query, every oracle
SQL actually runs in DuckDB (sf0.001, no Spark needed — fast guard
against SQL rot before the driver's real gate)."""
import duckdb
import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"parquet_scan('{SF}/{t}.parquet')")
    return c


def test_oracle_keys_subset_of_queries():
    assert set(em.oracle_sql()) <= set(em.queries())


def test_all_oracle_sql_runs(con):
    for name, sql in em.oracle_sql().items():
        try:
            con.sql(sql).fetchall()
        except Exception as ex:  # pragma: no cover
            raise AssertionError(f"oracle for {name} failed: {ex}") from ex


def test_queries_are_callables():
    for name, fn in em.queries().items():
        assert callable(fn), name
