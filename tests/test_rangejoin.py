"""Bucket-blocked interval join: exact containment semantics across
bucket boundaries, inner/left modes, key scoping, the long-interval
guard, and the plan (hash join, never a nested-loop/cartesian)."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from engine.operators.rangejoin import interval_join


@pytest.fixture()
def frames(spark):
    facts = spark.createDataFrame(
        [
            ("u1", 1, 100.0),    # inside iv A
            ("u1", 2, 7250.0),   # inside iv B (crosses bucket boundary)
            ("u1", 3, 500.0),    # inside no interval
            ("u2", 4, 100.0),    # same ts as fact 1 but other key
            ("u1", 5, 200.0),    # iv A boundary hi (inclusive)
        ],
        "user_id string, event_id long, ev_s double",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", "A", 50.0, 200.0),
            ("u1", "B", 3000.0, 7300.0),  # spans buckets 0..2 at w=3600
            ("u2", "C", 90.0, 110.0),
        ],
        "user_id string, iv_id string, lo_s double, hi_s double",
    )
    return facts, intervals


def test_inner_containment_and_keys(spark, frames):
    facts, intervals = frames
    got = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(
            facts, intervals, "ev_s", "lo_s", "hi_s",
            keys=["user_id"], bucket_s=3600.0,
        ).collect()
    }
    # fact 2 matches B even though its bucket (2) is not B's lo bucket;
    # fact 5 sits exactly on hi (inclusive); fact 3 matches nothing;
    # fact 4 only matches its own key's interval
    assert got == {(1, "A"), (5, "A"), (2, "B"), (4, "C")}


def test_left_keeps_unmatched_facts(spark, frames):
    facts, intervals = frames
    rows = {
        r["event_id"]: r
        for r in interval_join(
            facts, intervals, "ev_s", "lo_s", "hi_s",
            keys=["user_id"], bucket_s=3600.0, how="left",
        ).collect()
    }
    assert len(rows) == 5
    assert rows[3]["iv_id"] is None and rows[3]["lo_s"] is None
    assert rows[2]["iv_id"] == "B"


def test_no_keys_mode(spark, frames):
    facts, intervals = frames
    got = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(
            facts, intervals.filter("iv_id = 'C'"),
            "ev_s", "lo_s", "hi_s", bucket_s=3600.0,
        ).collect()
    }
    # without keys, BOTH user u1 and u2 facts at ts 100 hit interval C
    assert got == {(1, "C"), (4, "C")}


def test_long_interval_guard(spark, frames):
    facts, _ = frames
    huge = spark.createDataFrame(
        [("u1", "Z", 0.0, 1e9)], "user_id string, iv_id string, lo_s double, hi_s double"
    )
    with pytest.raises(ValueError, match="widen bucket_s"):
        interval_join(
            facts, huge, "ev_s", "lo_s", "hi_s",
            keys=["user_id"], bucket_s=1.0, max_buckets_per_row=100,
        )


def test_plan_is_hash_join_not_nested_loop(spark, frames):
    facts, intervals = frames
    # disable broadcast so the plan shows the at-scale join strategy
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = interval_join(
            facts, intervals, "ev_s", "lo_s", "hi_s",
            keys=["user_id"], bucket_s=3600.0,
        )
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert re.search(r"SortMergeJoin|ShuffledHashJoin", plan), plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
