"""Physical-plan contracts as tests: the scale promises (pruned scans,
broadcast dims, join-free as-of, no cartesian anywhere) must hold on
every run, not just when someone remembers tools/explain_audit.py."""

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def qs():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    return entry.queries()


@pytest.mark.parametrize(
    "name,must,must_not",
    [
        (
            "temp_sine_disagg",
            [r"ReadSchema: struct<ts:(bigint|timestamp_ntz),user_id:bigint,value:double>"],
            [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        ),
        (
            "humidity_dewpoint",
            [],
            [r"SortMergeJoin", r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        ),
        (
            "asof_attribution",
            [r"Window"],
            [r"Join", r"CartesianProduct"],
        ),
        (
            "embedding_neardup",
            [r"ArrowEvalPython|BatchEvalPython"],
            [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        ),
        (
            "minhash_pairs",
            [],
            [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
        ),
    ],
)
def test_plan_contract(spark, qs, name, must, must_not):
    plan = _plan(qs[name](spark, SF_DIR))
    for pat in must:
        assert re.search(pat, plan), f"{name}: missing /{pat}/"
    for pat in must_not:
        assert not re.search(pat, plan), f"{name}: found forbidden /{pat}/"
