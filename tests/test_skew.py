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
