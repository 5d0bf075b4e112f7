"""Distributed context generator (scale-bench fixture side): shape,
span coverage, determinism, and pipeline compatibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.generate_dist import generate_context_events_distributed


def test_distributed_context_shape_and_determinism(spark, transcripts_df):
    c1 = generate_context_events_distributed(transcripts_df, seed=43)
    c2 = generate_context_events_distributed(transcripts_df, seed=43)
    assert c1.columns == [
        "conv_id", "event_ts", "event_idx", "ctx_value", "ctx_label"
    ]
    rows1 = sorted(map(tuple, c1.collect()), key=repr)
    assert rows1 == sorted(map(tuple, c2.collect()), key=repr)
    assert len(rows1) > 0

    # per-conv event count within [1, 2*events_per_conv]
    counts = (
        c1.filter(~F.col("conv_id").startswith("ghost-"))
        .groupBy("conv_id").count().select("count").collect()
    )
    assert all(1 <= r["count"] <= 12 for r in counts)

    # a ghost share exists and is small (the unmatched-join stressor)
    n = c1.count()
    ghosts = c1.filter(F.col("conv_id").startswith("ghost-")).count()
    assert 0 < ghosts < 0.1 * n

    # event_ts stays within the [-5%, +15%]-expanded conversation span
    spans = transcripts_df.groupBy("conv_id").agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    )
    joined = (
        c1.filter(~F.col("conv_id").startswith("ghost-"))
        .join(spans, "conv_id")
        .withColumn("span_ms", F.unix_millis("hi") - F.unix_millis("lo"))
        .filter(
            (F.unix_millis("event_ts")
             < F.unix_millis("lo") - F.col("span_ms") * 0.06)
            | (F.unix_millis("event_ts")
               > F.unix_millis("lo") + F.col("span_ms") * 1.16)
        )
    )
    assert joined.count() == 0


def test_distributed_context_feeds_pipeline(spark, transcripts_df):
    """The generated context drives the full as-of feature path: some
    turns get non-null asof_ctx_value, and row count is preserved."""
    from engine.pipeline import extract_features

    ctx = generate_context_events_distributed(transcripts_df, seed=43)
    f, _e, _m = extract_features(spark, transcripts_df, ctx)
    assert f.count() == transcripts_df.count()
    assert f.filter(F.col("asof_ctx_value").isNotNull()).count() > 0
