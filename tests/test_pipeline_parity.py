"""The headline gate: full-pipeline allclose parity vs the pandas
oracle at every (conv_id, ts, turn_idx) — SURVEY.md §5.1-5.2."""

from engine.oracle.features import oracle_features
from engine.pipeline import extract_features
from tests.compare import assert_frames_match


def test_full_parity_jvm_asof(spark, transcripts_df, context_df, transcripts_pdf, context_pdf):
    features, errors, _ = extract_features(
        spark, transcripts_df, context_df, asof_strategy="jvm"
    )
    exp = oracle_features(transcripts_pdf, context_pdf)
    assert_frames_match(features.toPandas(), exp)


def test_full_parity_kernel_asof(spark, transcripts_df, context_df, transcripts_pdf, context_pdf):
    features, _, _ = extract_features(
        spark, transcripts_df, context_df, asof_strategy="kernel"
    )
    exp = oracle_features(transcripts_pdf, context_pdf)
    assert_frames_match(features.toPandas(), exp)


def test_parity_without_context(spark, transcripts_df, transcripts_pdf):
    features, _, _ = extract_features(spark, transcripts_df, None)
    exp = oracle_features(transcripts_pdf, None)
    assert_frames_match(features.toPandas(), exp)
