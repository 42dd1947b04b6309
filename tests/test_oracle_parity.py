"""End-to-end parity: every __spark_entry__ query vs its DuckDB oracle at
sf0.001 — the same comparison the driver's CORRECTNESS gate runs at sf0.01."""

from __future__ import annotations

import pytest

from tests.oracle_check import duckdb_conn, compare


def _entry():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_conn(sf_dir)


def _query_names():
    return sorted(_entry().queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, sf_dir, con, name):
    e = _entry()
    fn = e.queries()[name]
    sdf = fn(spark, sf_dir)
    oracles = e.oracle_sql()
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only contract
        return
    opdf = con.execute(oracles[name]).fetchdf()
    problems = compare(sdf, opdf, name)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    e = _entry()
    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == ["o_orderkey", "o_orderdate", "revenue"]
