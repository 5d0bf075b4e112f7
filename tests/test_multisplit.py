"""Multi-split input layouts (round-4 verdict item #4).

The adaptive repartition branches — `_heavy` in engine/doc_queries.py
and `repartition_before_text` in engine/pipeline.py — exist because
the sandbox gate tables are SINGLE parquet files (a scan coalesces to
1-2 tasks, so per-row kernels would run serially without an upfront
repartition), while at real scale the input has hundreds of splits
and a blind repartition would add a full extra shuffle of the text
for nothing. Until this file, only the single-file path ever ran in
the sandbox. These tests write BOTH layouts and pin each branch:

- 32+-split layout → the extra repartition is SKIPPED (the branch a
  100 TB input takes: zero exchanges in a narrow per-row plan);
- single-file layout → the repartition is TAKEN.

File-split arithmetic is made deterministic by pinning
spark.sql.files.maxPartitionBytes/openCostInBytes to 1 MiB for the
scan-side assertions (40 small files then cost ~40 MiB → ~40 scan
partitions; one file → 1-2), restored afterwards."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.001"


def _formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """(multi_dir, single_dir): the same documents table written as 40
    splits and as 1 split, under the gate queries' expected layout
    <dir>/documents.parquet."""
    base = tmp_path_factory.mktemp("layouts")
    src = spark.read.parquet(f"{SRC}/documents.parquet")
    multi, single = str(base / "multi"), str(base / "single")
    src.repartition(40).write.parquet(f"{multi}/documents.parquet")
    src.coalesce(1).write.parquet(f"{single}/documents.parquet")
    return multi, single


@pytest.fixture()
def small_split_conf(spark):
    mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    ocb = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 20))
    yield
    spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    spark.conf.set("spark.sql.files.openCostInBytes", ocb)


def test_heavy_skips_repartition_on_multisplit(
    spark, layouts, small_split_conf
):
    from engine.doc_queries import _heavy, q_doc_token_stats

    multi, single = layouts
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    wide = _heavy(spark, multi, "documents")
    assert wide.rdd.getNumPartitions() >= max(2, n_part // 2)
    # the at-scale branch: a narrow per-row query plans ZERO exchanges
    plan = _formatted(spark, q_doc_token_stats(spark, multi))
    assert "Exchange" not in plan, plan

    # the sandbox branch: single file → repartition taken (exactly one
    # round-robin exchange node, and only one)
    plan1 = _formatted(spark, q_doc_token_stats(spark, single))
    n_ex = len(re.findall(r"\(\d+\) Exchange\b", plan1))
    assert n_ex == 1 and "RoundRobin" in plan1, plan1


def test_pipeline_repartition_branch_on_multisplit(
    spark, layouts, small_split_conf, transcripts_df
):
    from engine.pipeline import extract_features

    base_multi = layouts[0]
    t_multi_path = f"{base_multi}/transcripts.parquet"
    transcripts_df.repartition(40).write.mode("overwrite").parquet(
        t_multi_path
    )
    t_single_path = f"{base_multi}/transcripts1.parquet"
    transcripts_df.coalesce(1).write.mode("overwrite").parquet(
        t_single_path
    )
    vocab = ["search", "bash", "browser", "vision", "code", "sql"]

    f_multi, _e, m_multi = extract_features(
        spark, spark.read.parquet(t_multi_path), None, vocab=vocab
    )
    f_single, _e, m_single = extract_features(
        spark, spark.read.parquet(t_single_path), None, vocab=vocab
    )
    assert m_multi["repartition_before_text"] is False
    assert m_single["repartition_before_text"] is True

    # plan shape: the multi-split path must plan exactly ONE exchange
    # (the window's ENSURE_REQUIREMENTS shuffle — no context here, so
    # no as-of union exchange); the single-split path adds the upfront
    # round-robin/hash repartition on top.
    def exchanges(df):
        return len(
            re.findall(r"\(\d+\) Exchange\b", _formatted(spark, df))
        )

    assert exchanges(f_multi) == 1, _formatted(spark, f_multi)
    assert exchanges(f_single) == exchanges(f_multi) + 1
