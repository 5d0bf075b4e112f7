"""Custom Python DataSource (spark.read.format('transcripts')):
schema contract, executor-side parallel generation, and partition-count
invariance of the produced table."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def registered(spark):
    from engine.sources.transcript_source import TranscriptDataSource

    spark.dataSource.register(TranscriptDataSource)
    return spark


def _load(spark, n_convs, partitions, seed=7):
    return (
        spark.read.format("transcripts")
        .option("n_convs", n_convs)
        .option("partitions", partitions)
        .option("seed", seed)
        .load()
    )


def test_schema_and_parallelism(registered):
    df = _load(registered, 40, 4)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ]
    assert df.rdd.getNumPartitions() == 4
    assert df.select("conv_id").distinct().count() == 40
    # every conversation has >= 2 turns and dense 0-based turn_idx
    from pyspark.sql import functions as F

    per = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("turn_idx").alias("lo"),
        F.max("turn_idx").alias("hi"),
    )
    bad = per.filter(
        (F.col("n") < 2) | (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
    ).count()
    assert bad == 0


def test_partition_count_invariance(registered):
    """Per-conversation seeding: the SAME table regardless of how the
    conv range is partitioned."""
    a = sorted(
        map(tuple, _load(registered, 30, 2).collect())
    )
    b = sorted(
        map(tuple, _load(registered, 30, 8).collect())
    )
    assert a == b and len(a) > 60


def test_source_feeds_pipeline(registered):
    """End-to-end: the registered source drives the flagship feature
    pipeline directly (no parquet staging)."""
    from engine.pipeline import extract_features

    t = _load(registered, 25, 4)
    feats, errs, _meta = extract_features(registered, t, None)
    assert feats.count() == t.count()
    assert errs.count() == 0


def test_stream_reader_matches_batch(registered, tmp_path):
    """Dual-mode source: readStream over the same format emits exactly
    the batch reader's rows (per-conversation seeding), across several
    micro-batches of convs_per_batch conversations."""
    import time

    sdf = (
        registered.readStream.format("transcripts")
        .option("n_convs", 30)
        .option("seed", 7)
        .option("convs_per_batch", 8)
        .option("partitions", 3)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_src_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    expect = sorted(map(tuple, _load(registered, 30, 4).collect()))
    deadline = time.time() + 120
    while time.time() < deadline:
        got = registered.sql("SELECT * FROM t_src_stream").collect()
        if len(got) >= len(expect):
            break
        time.sleep(1)
    q.stop()
    assert sorted(map(tuple, got)) == expect


def test_stream_reader_restart_no_duplicates(registered, tmp_path):
    """The round-3 review scenario: stop a streaming query mid-source,
    restart from its checkpoint, run to exhaustion — no conversation
    may be emitted twice and the union must equal the batch table.
    (The partition-planning stream reader variant regressed its offset
    counter on restart; the simple reader's read(start) cannot.)"""
    import time

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(min_rows, max_wait=120):
        sdf = (
            registered.readStream.format("transcripts")
            .option("n_convs", 24)
            .option("seed", 11)
            .option("convs_per_batch", 6)
            .load()
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        deadline = time.time() + max_wait
        while time.time() < deadline:
            try:
                n = registered.read.parquet(out_dir).count()
            except Exception:
                n = 0
            if n >= min_rows:
                break
            time.sleep(1)
        q.stop()
        q.awaitTermination(60)
        return registered.read.parquet(out_dir)

    expect = sorted(map(tuple, _load(registered, 24, 4, seed=11).collect()))
    # stop after SOME but not all rows, then restart to completion
    run(min_rows=1)
    got = sorted(map(tuple, run(min_rows=len(expect)).collect()))
    assert got == expect  # exactly once: no duplicates, nothing missing
