"""Replay of the reference's ENTIRE predicate test module.

Instead of hand-copying cases, this parses the parametrize lists straight
out of /root/reference/python/sedonadb/tests/functions/test_predicates.py
with ast.literal_eval at collection time and runs every (geom1, geom2,
expected) row through spark.sql — the complete DE-9IM predicate surface
(contains/coveredby/covers/disjoint/dwithin/equals/intersects/touches/
within/crosses/overlaps/relate/relate_pattern) verified against the
reference's own expectations (which it in turn verifies against PostGIS).
"""

import ast

import pytest

REF = "/root/reference/python/sedonadb/tests/functions/test_predicates.py"

SQL_NAME = {
    "contains": "ST_Contains",
    "covered_by": "ST_CoveredBy",
    "covers": "ST_Covers",
    "disjoint": "ST_Disjoint",
    "dwithin": "ST_DWithin",
    "equals": "ST_Equals",
    "intersects": "ST_Intersects",
    "touches": "ST_Touches",
    "within": "ST_Within",
    "crosses": "ST_Crosses",
    "overlaps": "ST_Overlaps",
    "relate": "ST_Relate",
    "relate_pattern": "ST_RelatePattern",
}


def _collect_cases():
    tree = ast.parse(open(REF).read())
    cases = []
    for node in tree.body:
        if not (isinstance(node, ast.FunctionDef)
                and node.name.startswith("test_st_")):
            continue
        pred = node.name[len("test_st_"):]
        if pred not in SQL_NAME:
            continue  # e.g. within_skipped (engine-specific skips)
        for dec in node.decorator_list:
            if not (isinstance(dec, ast.Call)
                    and getattr(dec.func, "attr", "") == "parametrize"):
                continue
            try:
                rows = ast.literal_eval(dec.args[1])
            except (ValueError, IndexError):
                continue
            if not rows or not isinstance(rows[0], tuple):
                continue
            if len(rows[0]) < 3:
                continue
            for row in rows:
                # round 3: GC operands normalize through the mixed-union
                # (mod-2 boundary) before relate — no exclusions left
                cases.append((pred,) + tuple(row))
    assert len(cases) >= 100, f"harvested only {len(cases)} cases"
    return cases


CASES = _collect_cases()


def _arg(v):
    if v is None:
        return "CAST(NULL AS BINARY)"
    return f"ST_GeomFromText('{v}')"


@pytest.mark.parametrize("case", CASES,
                         ids=[f"{c[0]}-{i}" for i, c in enumerate(CASES)])
def test_reference_predicate_case(spark, case):
    pred, rest = case[0], case[1:]
    fn = SQL_NAME[pred]
    if pred == "dwithin":
        g1, g2, dist, expected = rest
        d_sql = "CAST(NULL AS DOUBLE)" if dist is None else str(dist)
        expr = f"{fn}({_arg(g1)}, {_arg(g2)}, {d_sql})"
    elif pred == "relate_pattern":
        g1, g2, pattern, expected = rest
        p_sql = "CAST(NULL AS STRING)" if pattern is None else f"'{pattern}'"
        expr = f"{fn}({_arg(g1)}, {_arg(g2)}, {p_sql})"
    else:
        g1, g2, expected = rest
        expr = f"{fn}({_arg(g1)}, {_arg(g2)})"
    got = spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]
    assert got == expected, f"{expr}: got {got!r}, want {expected!r}"
