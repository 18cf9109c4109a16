"""Registry-wide plan audit: every query's EXECUTED plan is swept for
the two anti-patterns that are never acceptable in this engine, so a
new query can't silently ship one:

- ``CartesianProduct`` — an unconditional cross join over
  non-broadcast inputs (a broadcast-of-one-row cross join plans as
  BroadcastNestedLoopJoin and is fine; a CartesianProduct is not).
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. The
  engine's no-Python-UDF policy allows only Arrow-vectorized forms
  (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas), which plan
  under different node names.

The sweep runs the real registry entries at sf0.001 (cheap; streaming
entries run one bounded activation) — auditing the PLANS THAT
ACTUALLY RUN, not a handwritten allowlist of shapes.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_forbidden_plan_nodes(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Python UDTFs are row-at-a-time BY CONTRACT (the API being
    # covered, priced in sql_udtf_word_bigrams' docstring) — their
    # BatchEvalPythonUDTF node is exempt; a scalar row-UDF's bare
    # BatchEvalPython node is not.
    plan = plan.replace("BatchEvalPythonUDTF", "")
    for bad in FORBIDDEN:
        assert bad not in plan, f"{name}: {bad} in executed plan"
