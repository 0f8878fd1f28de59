"""Replay of the driver's correctness gate: every __spark_entry__ query vs
its DuckDB oracle at sf0.01 (row count + schema-sorted value hash)."""

import importlib
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from oracle_harness import duck_con, compare  # noqa: E402

entry_mod = importlib.import_module("__spark_entry__")

SF = "/root/testdata/sf0.01"
ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def con():
    return duck_con(SF)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) >= 1


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF)
    exp = con.sql(ORACLES[name]).df()
    ok, msg = compare(df, exp)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    assert QUERIES[name](spark, SF).count() >= 0
