"""Fixed, declared schemas — no inference anywhere.

Mirrors the reference's pydantic-at-the-boundary discipline
(reference: app/api/v1/models/analyze.py:44-114) as Spark StructTypes.
The transcripts shape is the authoritative `input_hint` from
BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: transcripts(conv_id, turn_idx, role, text, tool, ts)
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("role", T.StringType(), nullable=True),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("tool", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=False),
    ]
)

# Context/enrichment side for the as-of join (FIXTURES.md §2).
CONTEXT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("event_ts", T.TimestampType(), nullable=False),
        T.StructField("event_idx", T.IntegerType(), nullable=False),
        T.StructField("ctx_value", T.DoubleType(), nullable=False),
        T.StructField("ctx_label", T.StringType(), nullable=True),
    ]
)

# ---------------------------------------------------------------------------
# Output: one wide row per (conv_id, ts, turn_idx) — the per-turn feature
# vector (reference's UnifiedAnalysisResponse.features analog,
# models/analyze.py:74-77). Namespace prefixes per feature family.
# ---------------------------------------------------------------------------
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        # text family (reference postprocess_text, text_extractor.py:286-346)
        T.StructField("clean_text", T.StringType(), True),
        T.StructField("txt_len", T.IntegerType(), True),
        T.StructField("txt_words", T.IntegerType(), True),
        T.StructField("len_class", T.StringType(), True),
        # context backfill family (ffill within conversation)
        T.StructField("ctx_last_tool", T.StringType(), True),
        T.StructField("ctx_last_user_text", T.StringType(), True),
        # lag/lead family
        T.StructField("lag_text_len", T.IntegerType(), True),
        T.StructField("lead_text_len", T.IntegerType(), True),
        T.StructField("gap_prev_s", T.DoubleType(), True),
        T.StructField("gap_next_s", T.DoubleType(), True),
        # sessionization family (ts-gap, 1800 s)
        T.StructField("session_id", T.IntegerType(), True),
        T.StructField("sess_turn_no", T.IntegerType(), True),
        T.StructField("sess_len_so_far", T.LongType(), True),
        # rolling event-time family (past-only 300 s range frame)
        T.StructField("roll_cnt_5m", T.LongType(), True),
        T.StructField("roll_avg_len_5m", T.DoubleType(), True),
        # P8 neighborhood-relative: this turn's length vs its own
        # trailing-window mean (same window, no extra sort/shuffle)
        T.StructField("roll_rel_len_5m", T.DoubleType(), True),
        T.StructField("roll_tools_distinct_5m", T.IntegerType(), True),
        # as-of join family (against context_events)
        T.StructField("asof_ctx_value", T.DoubleType(), True),
        T.StructField("asof_ctx_label", T.StringType(), True),
        # expanding frequency top-k family (dominant-tool analog of the
        # reference's top-5 dominant colors, color_extractor.py:203-300)
        T.StructField("top_tools", T.ArrayType(T.StringType()), True),
    ]
)

# Quarantine/error sidecar (reference FeatureError, models/analyze.py:13-28).
ERROR_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("code", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
        T.StructField("severity", T.StringType(), False),
    ]
)

# Validation gate bounds (reference ImageValidationConfig,
# app/utils/image_validator.py:16-23 → transcript-domain analogs).
ROLE_DOMAIN = ("user", "assistant", "system", "tool")
MAX_TEXT_LEN = 100_000  # ROW_TOO_LARGE bound (≈ the 5/10 MB size gates)
SESSION_GAP_S = 1800  # 30-min ts-gap sessionization threshold
ROLL_WINDOW_S = 300  # rolling event-time frame (5 min)
TOP_K_TOOLS = 3  # accent-list arity analog (color_extractor.py:261-269)
