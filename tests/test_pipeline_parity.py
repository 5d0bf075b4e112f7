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


def test_kernel_asof_with_large_vocab_topk(spark, transcripts_df, context_df):
    """The kernel as-of splits conversations across cogroup chunks, so
    the large-vocab expanding top-k must NOT assume conversation-
    contiguous partitions after it (round-3 review: assume_partitioned
    ran per-partition counts over chunked conversations, silently
    corrupting top_tools). Features must match the jvm strategy's."""
    from engine.pipeline import extract_features

    big_vocab = [f"tool{i:03d}" for i in range(70)] + [
        "search", "browser", "python", "bash", "calculator", "sql",
        "retrieval", "editor", "planner", "mailer", "scheduler", "vision",
    ]
    fk, _, mk = extract_features(
        spark, transcripts_df, context_df, vocab=big_vocab,
        asof_strategy="kernel",
    )
    fj, _, mj = extract_features(
        spark, transcripts_df, context_df, vocab=big_vocab,
        asof_strategy="jvm",
    )
    assert mk["topk_strategy"] == "stream" == mj["topk_strategy"]
    key = ["conv_id", "turn_idx"]
    a = fk.select(*key, "top_tools").toPandas().sort_values(key).reset_index(drop=True)
    b = fj.select(*key, "top_tools").toPandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    bad = [
        i for i in range(len(a))
        if list(a["top_tools"][i]) != list(b["top_tools"][i])
    ]
    assert not bad, (len(bad), a.iloc[bad[:3]], b.iloc[bad[:3]])


def test_summarize_conversations_pandas_parity(spark, transcripts_df, context_df):
    """Conversation rollup vs a pandas groupby oracle over the same
    feature rows: counts, span, role mix, text stats, and the final
    dominant-tool state all agree per conversation."""
    import numpy as np

    from engine.pipeline import extract_features, summarize_conversations

    feats, _e, _m = extract_features(spark, transcripts_df, context_df)
    got = {r["conv_id"]: r for r in summarize_conversations(feats).collect()}
    pdf = feats.toPandas()
    assert set(got) == set(pdf["conv_id"].unique())
    for conv, g in pdf.groupby("conv_id"):
        r = got[conv]
        assert r["n_turns"] == len(g)
        assert r["n_sessions"] == int(g["session_id"].max()) + 1
        span = (g["ts"].max() - g["ts"].min()).total_seconds()
        assert abs(r["span_s"] - span) < 1e-3
        assert r["n_user_turns"] == int((g["role"] == "user").sum())
        assert r["n_assistant_turns"] == int((g["role"] == "assistant").sum())
        assert r["tools_distinct"] == g["tool"].dropna().nunique()
        assert r["total_txt_len"] == int(g["txt_len"].fillna(0).sum())
        assert r["max_txt_len"] == int(g["txt_len"].max())
        if g["txt_len"].notna().any():
            assert abs(r["avg_txt_len"] - round(float(g["txt_len"].mean()), 6)) < 1e-6
        last = g.sort_values(["ts", "turn_idx"]).iloc[-1]
        assert list(r["final_top_tools"]) == list(last["top_tools"])
