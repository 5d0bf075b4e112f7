"""Top-k dominant tools: expanding kernel semantics + whole-conv SQL
variant (reference dominant-color contract, SURVEY.md §2.4/2.5)."""

import pandas as pd

from pyspark.sql import functions as F

from engine.operators.topk import top_tools_expanding_py, top_tools_final
from engine.schema import TRANSCRIPT_SCHEMA


def test_expanding_semantics():
    s = pd.Series(["a", None, "b", "b", "", "a", "c", "a"])
    out = top_tools_expanding_py(s, k=3)
    assert out[0] == ["a", "a", "a"]           # pad repeats last
    assert out[1] == ["a", "a", "a"]           # null ignored
    assert out[2] == ["a", "b", "b"]           # tie 1-1 → count desc, name asc
    assert out[3] == ["b", "a", "a"]           # b=2 > a=1
    assert out[4] == ["b", "a", "a"]           # '' ignored
    assert out[5] == ["a", "b", "b"]           # tie 2-2 → name asc
    assert out[6] == ["a", "b", "c"]
    assert out[7] == ["a", "b", "c"]           # a=3,b=2,c=1


def test_empty_stays_empty():
    assert top_tools_expanding_py(pd.Series([None, ""]), k=3) == [[], []]


def test_final_topk_matches_pandas(spark, transcripts_df, transcripts_pdf):
    got = top_tools_final(transcripts_df, k=3).toPandas()
    t = transcripts_pdf
    t = t[t["tool"].notna() & (t["tool"] != "")]
    exp = (
        t.groupby(["conv_id", "tool"]).size().rename("tool_count").reset_index()
    )
    exp["rank"] = (
        exp.sort_values(["tool_count", "tool"], ascending=[False, True])
        .groupby("conv_id")
        .cumcount()
        + 1
    )
    exp = exp[exp["rank"] <= 3]
    keys = ["conv_id", "rank"]
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(
        got.astype({"tool_count": "int64", "rank": "int64"}),
        exp.astype({"tool_count": "int64", "rank": "int64"}),
    )


def test_stream_equals_grouped_strategy(spark, transcripts_df):
    """Differential: the mapInPandas stream kernel must agree with the
    per-group applyInPandas kernel on every row."""
    from engine.pipeline import add_text_features
    from engine.operators.topk import add_top_tools_expanding

    base = add_text_features(transcripts_df)
    a = add_top_tools_expanding(base, strategy="stream").select(
        "conv_id", "ts", "turn_idx", "top_tools"
    )
    b = add_top_tools_expanding(base, strategy="grouped").select(
        "conv_id", "ts", "turn_idx", "top_tools"
    )
    pa = a.toPandas().sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    pb = b.toPandas().sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    assert pa["top_tools"].map(list).equals(pb["top_tools"].map(list))


def test_vocab_equals_grouped_strategy(spark, transcripts_df):
    """Differential: the pure-codegen vocab formulation must agree with
    the per-group kernel on every row."""
    from engine.pipeline import add_text_features
    from engine.operators.topk import add_top_tools_expanding, add_top_tools_vocab

    base = add_text_features(transcripts_df)
    a = add_top_tools_vocab(base).select("conv_id", "ts", "turn_idx", "top_tools")
    b = add_top_tools_expanding(base, strategy="grouped").select(
        "conv_id", "ts", "turn_idx", "top_tools"
    )
    pa_ = a.toPandas().sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    pb = b.toPandas().sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    assert pa_["top_tools"].map(list).equals(pb["top_tools"].map(list))


def test_rolling_approx_distinct_tolerance(spark, transcripts_df):
    """add_rolling(approx_distinct=True) — the bench-scale sketch path —
    stays within HLL++ tolerance of the exact rolling distinct (tool
    vocabularies are small, so the estimate is exact or off by <=1)."""
    from engine.operators import windows as W
    from engine.pipeline import add_text_features

    base = W.with_ts_sec(add_text_features(transcripts_df))
    exact = W.add_rolling(base, approx_distinct=False).select(
        "conv_id", "ts", "turn_idx", "roll_tools_distinct_5m"
    )
    approx = W.add_rolling(base, approx_distinct=True).select(
        "conv_id", "ts", "turn_idx",
        F.col("roll_tools_distinct_5m").alias("approx_d"),
    )
    joined = exact.join(approx, ["conv_id", "ts", "turn_idx"]).select(
        "roll_tools_distinct_5m", "approx_d"
    )
    rows = joined.collect()
    assert rows
    worst = max(abs(r["roll_tools_distinct_5m"] - r["approx_d"]) for r in rows)
    # rsd 0.05 on counts <= ~12 distinct tools: off by at most 1
    assert worst <= 1, worst


def test_vocab_duplicates_deduped(spark, transcripts_df):
    """A duplicated catalog-stat vocab entry must not repeat the same
    tool inside top_tools (round-3 review)."""
    from engine.operators.topk import add_top_tools_vocab

    base = add_top_tools_vocab(
        transcripts_df, vocab=["search", "python", "bash"]
    ).select("conv_id", "turn_idx", "top_tools")
    duped = add_top_tools_vocab(
        transcripts_df, vocab=["search", "search", "python", "bash"]
    ).select("conv_id", "turn_idx", "top_tools")
    merged = base.join(
        duped.withColumnRenamed("top_tools", "tt2"), ["conv_id", "turn_idx"]
    )
    from pyspark.sql import functions as F

    assert merged.filter(F.col("top_tools") != F.col("tt2")).count() == 0
