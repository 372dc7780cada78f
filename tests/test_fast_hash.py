"""Fast-hash mode (SPARK_GRAFT_FAST_HASH=1): the sketch family swaps
the portable md5-derived 60-bit hash for JVM-native xxhash64 (the
production configuration bench.py measures). Estimates under the fast
family can't be value-checked against DuckDB (different hash → different
sketch cells), so these tests pin the two things that must survive the
swap: (1) the plan really uses xxhash64 and drops the md5 chain, and
(2) every analytic guarantee that is hash-family-independent still
holds (one-sided overestimates, probability ranges, threshold filters).
"""

from __future__ import annotations

import os

import pytest

from engine.registry import all_queries

from .conftest import SF_SMOKE


@pytest.fixture()
def fast_hash_env():
    os.environ["SPARK_GRAFT_FAST_HASH"] = "1"
    yield
    os.environ.pop("SPARK_GRAFT_FAST_HASH", None)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fast_mode_swaps_hash_in_plan(spark, fast_hash_env):
    qs = all_queries()
    df = qs["agg_countmin_heavy"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "xxhash64" in plan
    assert "md5" not in plan


def test_portable_mode_is_the_default(spark):
    assert os.environ.get("SPARK_GRAFT_FAST_HASH") != "1"
    qs = all_queries()
    plan = _plan(qs["agg_countmin_heavy"](spark, SF_SMOKE))
    assert "md5" in plan and "xxhash64" not in plan


def test_countmin_overestimates_under_fast_hash(spark, fast_hash_env):
    qs = all_queries()
    rows = qs["agg_countmin_heavy"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["cm_est"] >= r["exact_cnt"] > 0
        assert r["overcount"] == r["cm_est"] - r["exact_cnt"]


def test_join_size_overestimates_under_fast_hash(spark, fast_hash_env):
    qs = all_queries()
    [r] = qs["agg_join_size_estimate"](spark, SF_SMOKE).collect()
    assert r["est_join_rows"] >= r["exact_join_rows"] > 0
    assert r["overcount"] == r["est_join_rows"] - r["exact_join_rows"]


def test_kmv_and_bloom_ranges_under_fast_hash(spark, fast_hash_env):
    qs = all_queries()
    [k] = qs["agg_kmv_set_sketch"](spark, SF_SMOKE).collect()
    # sketch estimates are positive; jaccard is a probability
    for col, v in k.asDict().items():
        if "jaccard" in col:
            assert 0.0 <= v <= 1.0
        elif "est" in col:
            assert v > 0
    [b] = qs["agg_bloom_filter_report"](spark, SF_SMOKE).collect()
    assert 0.0 <= b["fpr_measured"] <= 1.0


def test_near_minhash_pairs_respect_threshold_under_fast_hash(
    spark, fast_hash_env
):
    qs = all_queries()
    rows = qs["dedup_near_minhash"](spark, SF_SMOKE).collect()
    # every emitted pair passed the exact-Jaccard verify regardless of
    # which hash family proposed it as a candidate
    for r in rows:
        assert r["jaccard_dist"] <= 0.2 + 1e-9


def test_hll_sliding_positive_under_fast_hash(spark, fast_hash_env):
    qs = all_queries()
    rows = qs["win_hll_sliding_distinct"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["hll_est"] >= 0 and r["exact_distinct"] >= 0
