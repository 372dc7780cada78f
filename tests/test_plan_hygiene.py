"""Repo-wide physical-plan hygiene gates.

tests/test_plans.py pins load-bearing plan shapes for individual keys;
this module sweeps EVERY registered key's plan and asserts the two
invariants that must hold across the whole surface for the 100 TB
posture (surveyed clean in round 5 — these gates keep it that way):

- no `CartesianProduct` anywhere: every cross join in the engine is
  broadcast-sided (BroadcastNestedLoopJoin against a tiny side) or an
  equi-join in disguise; an unhinted cartesian product is always a bug.
- row-at-a-time Python (`BatchEvalPython`) only in the keys that
  DECLARE it (the `udf_python_scalar` / `udtf_tokenize` API-surface
  demos); everything else stays JVM-side or Arrow-batched.

Keys whose build phase runs driver-sized eager work (k-core, MMR, BFS,
pagerank) return createDataFrame results — their plans are local scans
and pass vacuously, which is correct: their distributed stages are
plan-gated individually in test_plans.py.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from engine.registry import all_queries

from .conftest import SF_SMOKE

#: keys whose API contract IS row-at-a-time Python (SURVEY §2 Table B,
#: plus the Table O polymorphic table-argument UDTF)
ROW_PYTHON_OK = {"udf_python_scalar", "udtf_tokenize", "udtf_table_arg"}

_plans: dict[str, str] = {}


def _plan_map(spark) -> dict[str, str]:
    if _plans:
        return _plans
    from engine.session import drain_scratch_caches

    for key, fn in all_queries().items():
        try:
            df = fn(spark, SF_SMOKE)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="formatted")
            _plans[key] = buf.getvalue()
        finally:
            drain_scratch_caches()
    return _plans


def test_no_cartesian_product_anywhere(spark):
    offenders = [k for k, p in _plan_map(spark).items() if "CartesianProduct" in p]
    assert offenders == []


def test_row_python_only_in_declared_keys(spark):
    offenders = [
        k
        for k, p in _plan_map(spark).items()
        if "BatchEvalPython" in p and k not in ROW_PYTHON_OK
    ]
    assert offenders == []


def test_declared_row_python_keys_still_exercise_it(spark):
    # the allowlist must not rot into dead entries
    plans = _plan_map(spark)
    for k in sorted(ROW_PYTHON_OK):
        assert "BatchEvalPython" in plans[k], k


def test_every_registered_key_produces_a_plan(spark):
    plans = _plan_map(spark)
    assert len(plans) == len(all_queries())
    empty = [k for k, p in plans.items() if not p.strip()]
    assert empty == []
