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


def test_registry_fits_driver_window():
    """Round-7 VERDICT #8: the driver's correctness gate records only the
    first 50 queries in dict order — a 51st entry would silently lose its
    CORRECTNESS row (the round-6 window bug).  Merge same-schema
    execution tiers under a tagged-union slot (see
    plans/demo_queries._tagged_union) before adding new keys."""
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    assert len(q) <= 50, (
        f"{len(q)} queries > the driver's 50-slot correctness window — "
        "merge tiers under a tagged-union slot instead of adding keys")
    # every query has an oracle (or is a documented rows-only exception)
    assert set(o) <= set(q)
