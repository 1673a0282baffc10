"""Mini-driver conformance: every queries() entry with an oracle must
match DuckDB on the real testdata (sf0.001 for speed; the driver runs the
same comparison at sf0.01)."""

import pytest

import __ray_entry__ as entrymod
from tests.oracle_utils import compare, duckdb_con, to_pandas

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
SQL = entrymod.oracle_sql()
ORACLED = sorted(SQL)
ROWS_ONLY = sorted(set(QUERIES) - set(SQL))


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


def test_every_sql_key_has_a_query():
    assert set(SQL) <= set(QUERIES)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(name, con, ray_session):
    ray_df = to_pandas(QUERIES[name](SF_DIR))
    sql_df = con.execute(SQL[name]).fetchdf()
    problems = compare(ray_df, sql_df)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, ray_session):
    df = to_pandas(QUERIES[name](SF_DIR))
    assert df is not None and len(df.columns) > 0


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    assert ds.count() >= 0
    schema_names = set(ds.schema().names)
    assert {"url", "extracted_text", "status", "spans"} <= schema_names
