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
            # no-keys mode: the interval side must not carry the (now
            # non-key) user_id column — shared non-key names are rejected
            facts, intervals.filter("iv_id = 'C'").drop("user_id"),
            "ev_s", "lo_s", "hi_s", bucket_s=3600.0,
        ).collect()
    }
    # without keys, BOTH user u1 and u2 facts at ts 100 hit interval C
    assert got == {(1, "C"), (4, "C")}


def test_long_interval_guard(spark, frames):
    """The guard is IN-PLAN (no driver pre-action that would re-execute
    the intervals lineage): it raises when the join executes."""
    facts, _ = frames
    huge = spark.createDataFrame(
        [("u1", "Z", 0.0, 1e9)], "user_id string, iv_id string, lo_s double, hi_s double"
    )
    df = interval_join(
        facts, huge, "ev_s", "lo_s", "hi_s",
        keys=["user_id"], bucket_s=1.0, max_buckets_per_row=100,
    )
    with pytest.raises(Exception, match="widen bucket_s"):
        df.count()


def test_inverted_interval_matches_nothing(spark, frames):
    """lo > hi matches nothing (theta-join semantics) and must NOT
    reach sequence(), which would build a huge descending bucket array
    and bypass the span guard (review finding)."""
    facts, _ = frames
    bad = spark.createDataFrame(
        [("u1", "INV", 1e9, 0.0), ("u1", "OK", 50.0, 200.0)],
        "user_id string, iv_id string, lo_s double, hi_s double",
    )
    got = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(
            facts, bad, "ev_s", "lo_s", "hi_s",
            keys=["user_id"], bucket_s=1.0, max_buckets_per_row=1000,
        ).collect()
    }
    assert got == {(1, "OK"), (5, "OK")}


def test_colliding_column_names_rejected(spark, frames):
    facts, intervals = frames
    with pytest.raises(ValueError, match="share non-key columns"):
        interval_join(
            facts.withColumn("iv_id", facts["event_id"]),
            intervals, "ev_s", "lo_s", "hi_s", keys=["user_id"],
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


def test_interval_join_matches_theta_join_random(spark):
    """Property check: on random facts/intervals (including intervals
    much longer and much shorter than the bucket width, shared keys,
    exact-boundary hits), the bucket-blocked join equals the naive
    theta join for inner AND left modes."""
    import random

    rng = random.Random(4242)
    facts = spark.createDataFrame(
        [
            (f"u{rng.randrange(4)}", i, round(rng.uniform(0, 50_000), 3))
            for i in range(300)
        ],
        "user_id string, event_id long, ev_s double",
    )
    ivs = []
    for j in range(60):
        lo = round(rng.uniform(0, 50_000), 3)
        length = rng.choice([5.0, 500.0, 9_000.0])  # « w, ~w, » w
        ivs.append((f"u{rng.randrange(4)}", f"iv{j}", lo, round(lo + length, 3)))
    intervals = spark.createDataFrame(
        ivs, "user_id string, iv_id string, lo_s double, hi_s double"
    )

    naive = facts.alias("f").join(
        intervals.alias("i"),
        (F.col("f.user_id") == F.col("i.user_id"))
        & (F.col("f.ev_s") >= F.col("i.lo_s"))
        & (F.col("f.ev_s") <= F.col("i.hi_s")),
    )
    expect = {
        (r["event_id"], r["iv_id"]) for r in naive.select("event_id", "iv_id").collect()
    }
    got = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(
            facts, intervals, "ev_s", "lo_s", "hi_s",
            keys=["user_id"], bucket_s=3600.0,
        ).collect()
    }
    assert got == expect and len(expect) > 0

    left = interval_join(
        facts, intervals, "ev_s", "lo_s", "hi_s",
        keys=["user_id"], bucket_s=3600.0, how="left",
    ).collect()
    matched = {(r["event_id"], r["iv_id"]) for r in left if r["iv_id"] is not None}
    unmatched = {r["event_id"] for r in left if r["iv_id"] is None}
    assert matched == expect
    assert unmatched == {
        r["event_id"] for r in facts.collect()
    } - {e for e, _ in expect}
