import numpy as np
import pandas as pd

from engine.generate import generate_context_events, generate_transcripts


def test_deterministic():
    a = generate_transcripts(n_convs=50, seed=42)
    b = generate_transcripts(n_convs=50, seed=42)
    pd.testing.assert_frame_equal(a, b)


def test_shape_and_rules(transcripts_pdf):
    df = transcripts_pdf
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df["conv_id"].notna().all() and df["ts"].notna().all()
    # dense turn_idx per conv
    g = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    assert (g.apply(lambda s: (np.diff(s) == 1).all())).all()
    # monotone non-decreasing ts within conv under turn order
    srt = df.sort_values(["conv_id", "turn_idx"])
    assert (
        srt.groupby("conv_id")["ts"].apply(lambda s: s.is_monotonic_increasing).all()
    )
    # stressors present
    assert df["text"].isna().mean() > 0.005
    assert (df["text"] == "").mean() > 0.005
    assert df["tool"].isna().mean() > 0.3
    # duplicate-ts ties exist (tie-break coverage)
    dups = srt.groupby(["conv_id", "ts"]).size()
    assert (dups > 1).any()
    # skew: largest conversation much bigger than median
    sizes = df.groupby("conv_id").size()
    assert sizes.max() >= 10 * sizes.median()


def test_context_rules(transcripts_pdf, context_pdf):
    ctx = context_pdf
    assert ctx["event_idx"].is_unique
    # boundary events: some event_ts exactly equal a turn ts of same conv
    merged = ctx.merge(
        transcripts_pdf, left_on=["conv_id", "event_ts"], right_on=["conv_id", "ts"]
    )
    assert len(merged) > 0
    # unmatched conv ids exist
    assert (~ctx["conv_id"].isin(set(transcripts_pdf["conv_id"]))).any()
