"""Unit tests for the plan-audit rules (tools/audit_plans.py).

The audit runs over every registered query in CI; these tests pin the
rule semantics on synthetic plan fragments so a regex regression can't
silently stop flagging (or start false-flagging) the anti-patterns.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from audit_plans import audit  # noqa: E402


GLOBAL_WINDOW_PLAN = """\
*(3) Project [day_ms#10L, total#12]
+- Window [sum(total#12) windowspecdefinition(day_ms#10L ASC NULLS FIRST, specifiedwindowframe(RowFrame, -6, currentrow$())) AS w#20], [day_ms#10L ASC NULLS FIRST]
   +- Sort [day_ms#10L ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=42]
         +- HashAggregate(keys=[day_ms#10L], functions=[sum(total#8)])
"""

KEYED_WINDOW_PLAN = """\
*(3) Project [user_id#3L, rn#20]
+- Window [row_number() windowspecdefinition(user_id#3L, ts#5L ASC NULLS FIRST) AS rn#20], [user_id#3L], [ts#5L ASC NULLS FIRST]
   +- Sort [user_id#3L ASC NULLS FIRST, ts#5L ASC NULLS FIRST], false, 0
      +- Exchange hashpartitioning(user_id#3L, 32), ENSURE_REQUIREMENTS, [plan_id=41]
         +- Scan parquet [user_id#3L, ts#5L]
"""

GLOBAL_AGG_PLAN = """\
*(2) HashAggregate(keys=[], functions=[sum(x#1L)])
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]
   +- *(1) HashAggregate(keys=[], functions=[partial_sum(x#1L)])
      +- Scan parquet [x#1L]
"""


def test_global_ordered_window_flagged():
    flags = audit("q", GLOBAL_WINDOW_PLAN)
    assert any("global-ordered WindowExec" in f for f in flags), flags


def test_keyed_window_not_flagged():
    assert audit("q", KEYED_WINDOW_PLAN) == []


def test_global_aggregate_single_exchange_allowed():
    # one SinglePartition exchange for a final global aggregate is the
    # sanctioned shape (bounded output) — no flag.
    assert audit("q", GLOBAL_AGG_PLAN) == []


def test_two_single_partition_exchanges_flagged():
    plan = GLOBAL_AGG_PLAN + GLOBAL_AGG_PLAN
    flags = audit("q", plan)
    assert any("Exchange SinglePartition" in f for f in flags), flags


def test_python_row_udf_flagged():
    flags = audit("q", "+- BatchEvalPython [f(x#1)]\n   +- Scan parquet [x#1]")
    assert flags, "row-at-a-time Python UDF must be flagged"


@pytest.mark.usefixtures("spark")
def test_orders_daily_moving_avg_plan_has_no_single_partition(spark):
    """The r5 rewrite (two-pass rownum + frame fan-out join) must keep
    the trailing-average plan free of ANY single-partition exchange —
    the audit's former <=1 allowance is no longer consumed here."""
    from stream_spark.queries.advanced_queries import orders_daily_moving_avg

    df = orders_daily_moving_avg(spark, os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


DEEP_CHAIN_WINDOW_PLAN = """\
*(4) Project [day_ms#10L, avg7#22]
+- Window [avg(total#12) windowspecdefinition(day_ms#10L ASC NULLS FIRST, specifiedwindowframe(RowFrame, -6, currentrow$())) AS avg7#22], [day_ms#10L ASC NULLS FIRST]
   +- Project [day_ms#10L, total#12]
      +- Sort [day_ms#10L ASC NULLS FIRST], false, 0
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=77]
            +- HashAggregate(keys=[day_ms#10L], functions=[sum(total#8)])
"""

SIBLING_EXCHANGE_PLAN = """\
*(5) SortMergeJoin [k#1L], [k#2L], Inner
:- Window [row_number() windowspecdefinition(k#1L, ts#3L ASC NULLS FIRST) AS rn#9], [k#1L], [ts#3L ASC NULLS FIRST]
:  +- Sort [k#1L ASC NULLS FIRST, ts#3L ASC NULLS FIRST], false, 0
:     +- Exchange hashpartitioning(k#1L, 32), ENSURE_REQUIREMENTS, [plan_id=11]
:        +- Scan parquet [k#1L, ts#3L]
+- HashAggregate(keys=[], functions=[sum(x#4L)])
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=12]
      +- HashAggregate(keys=[], functions=[partial_sum(x#4L)])
         +- Scan parquet [k#2L, x#4L]
"""


def test_deep_chain_single_partition_under_window_flagged():
    """Window -> Project -> Sort -> Exchange SinglePartition (two
    intermediate lines) must be flagged — the r5 fixed-lookahead regex
    let it escape (r5 advice, audit_plans.py:89)."""
    flags = audit("q", DEEP_CHAIN_WINDOW_PLAN)
    assert any("global-ordered WindowExec" in f for f in flags), flags


def test_single_partition_in_sibling_subtree_not_window_flagged():
    """A SinglePartition exchange in a SIBLING subtree (global agg on
    the other join side) is NOT under the Window — the indent-aware
    scan must not false-flag it."""
    flags = audit("q", SIBLING_EXCHANGE_PLAN)
    assert not any("global-ordered WindowExec" in f for f in flags), flags
