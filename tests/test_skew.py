"""Salted-key skew mitigation: salted results identical to unsalted
(invariance under salting, SURVEY §5.4); hot-entity detector finds the
planted zipf head."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.operators.core import topk_by_count
from engine.operators.skew import hot_entities, salted_topk_by_count


def test_salted_topk_identical_to_unsalted(spark, transcripts_df):
    base = topk_by_count(
        transcripts_df.filter(F.col("tool").isNotNull() & (F.col("tool") != "")),
        "conv_id",
        "tool",
        3,
    )
    salted = salted_topk_by_count(
        transcripts_df.filter(F.col("tool").isNotNull() & (F.col("tool") != "")),
        "conv_id",
        "tool",
        3,
        idx_col="turn_idx",
        salt_buckets=16,
    )
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) > 0


def test_hot_entity_detector_finds_zipf_head(spark, transcripts_df):
    # exact shares for ground truth
    total = transcripts_df.count()
    exact = {
        r["conv_id"]: r["n"] / total
        for r in transcripts_df.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    truly_hot = {c for c, f in exact.items() if f >= 0.02}
    assert truly_hot, "generator should plant at least one >=2% conversation"
    # generous sample (small fixture) → detector must find every >=2% key
    got = {
        r["conv_id"]
        for r in hot_entities(
            transcripts_df, "conv_id", threshold_frac=0.01, sample_frac=0.5
        ).collect()
    }
    assert truly_hot <= got
    # and nothing tiny sneaks in
    assert all(exact[c] >= 0.003 for c in got)


def test_kernel_asof_hot_entity_chunked(spark, transcripts_df, context_df):
    """The bucketed+salted kernel as-of handles a planted hot
    conversation: (a) results bit-identical to the jvm strategy, (b)
    with chunks=c the hot entity's probe rows really are split across
    c cogroups (no single pandas frame holds the whole entity)."""
    from engine.operators.asof import asof_join

    hot = transcripts_df.groupBy("conv_id").count().orderBy(
        F.col("count").desc()).first()
    args = dict(
        on="conv_id", probe_ts="ts", probe_idx="turn_idx",
        ctx_ts="event_ts", ctx_idx="event_idx",
        payload=["ctx_value"], prefix="asof_",
    )
    jvm = asof_join(transcripts_df, context_df, strategy="jvm", **args)
    ker = asof_join(
        transcripts_df, context_df, strategy="kernel",
        kernel_buckets=8, kernel_chunks=4, **args,
    )
    cols = ["conv_id", "ts", "turn_idx", "asof_ctx_value"]
    a = sorted(map(tuple, jvm.select(cols).collect()))
    b = sorted(map(tuple, ker.select(cols).collect()))
    assert a == b and len(a) > 0

    # chunk-split property: the hot conversation's rows spread over >1
    # chunk id (hash of turn_idx), so no cogroup sees the whole entity
    n_chunks = (
        transcripts_df.filter(F.col("conv_id") == hot["conv_id"])
        .select(F.pmod(F.xxhash64("turn_idx"), F.lit(4)).alias("c"))
        .distinct().count()
    )
    assert n_chunks > 1


def test_auto_topk_dispatch_differential(spark, transcripts_df):
    """auto_topk_by_count: (a) on the zipf fixture (planted hot
    conversation, generous sample so the detector fires) the salted
    branch's output is bit-identical to the plain operator; (b) on a
    uniform input where nothing is hot, the chosen plan is the plain
    one — no salt column anywhere in it."""
    from engine.operators.skew import auto_topk_by_count

    src = transcripts_df.filter(
        F.col("tool").isNotNull() & (F.col("tool") != "")
    )
    base = topk_by_count(src, "conv_id", "tool", 3)
    auto = auto_topk_by_count(
        src, "conv_id", "tool", 3, idx_col="turn_idx",
        threshold_frac=0.01, sample_frac=0.5,
    )
    # the fixture's planted hot conversation must trigger the salted
    # branch (same detector config test_hot_entity_detector pins)
    assert "_salt" in auto._jdf.queryExecution().optimizedPlan().toString()
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, auto.collect()))
    assert a == b and len(a) > 0

    uniform = spark.createDataFrame(
        [(f"c{i % 40}", f"t{i % 5}", i) for i in range(2000)],
        "conv_id string, tool string, turn_idx int",
    )
    plain = auto_topk_by_count(
        uniform, "conv_id", "tool", 3, idx_col="turn_idx",
        threshold_frac=0.1, sample_frac=0.5,
    )
    assert "_salt" not in plain._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, topk_by_count(uniform, "conv_id", "tool", 3).collect())
    )


def test_hot_entities_small_sample_returns_nothing(spark):
    """With too few sampled rows to distinguish hot from noise, the
    detector must return an EMPTY set — the old max(1, ...) floor
    declared every sampled entity hot (round-3 review)."""
    from engine.operators.skew import hot_entities

    tiny = spark.createDataFrame(
        [(f"c{i}", i) for i in range(50)], "conv_id string, x int"
    )
    assert hot_entities(tiny, "conv_id", threshold_frac=0.01,
                        sample_frac=0.5).count() == 0
