"""Error-path tests: malformed rows land in quarantine with typed
codes; good rows are unaffected (FIXTURES.md §4, reference
FeatureError analog)."""

import pandas as pd
import pytest

from engine.operators.quality import split_quarantine
from engine.pipeline import extract_features
from engine.schema import MAX_TEXT_LEN
from pyspark.sql import types as T

LOOSE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


@pytest.fixture(scope="module")
def dirty(spark, transcripts_pdf):
    base = transcripts_pdf.head(200).copy()
    bad = pd.DataFrame(
        {
            "conv_id": [None, "conv-bad-1", "conv-bad-2", "conv-bad-3", "conv-bad-4"],
            "turn_idx": [0, 0, 0, -3, None],
            "role": ["user", "wizard", "user", "assistant", "user"],
            "text": ["x", "y", "z" * (MAX_TEXT_LEN + 1), "w", "v"],
            "tool": [None] * 5,
            "ts": pd.to_datetime(
                ["2024-01-01", None, "2024-01-03", "2024-01-04", "2024-01-05"]
            ),
        }
    )
    pdf = pd.concat([base, bad], ignore_index=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("Int32")
    return spark.createDataFrame(pdf, schema=LOOSE_SCHEMA), len(base)


def test_split_codes(spark, dirty):
    df, n_good = dirty
    good, errors = split_quarantine(df)
    errs = errors.toPandas()
    assert good.count() == n_good
    codes = sorted(errs["code"].tolist())
    # null conv_id → MISSING_KEY; null ts → MISSING_KEY (first gate wins);
    # wizard → INVALID_ENUM... but that row also has null ts → MISSING_KEY
    assert codes == sorted(
        ["MISSING_KEY", "MISSING_KEY", "ROW_TOO_LARGE", "BAD_TURN_INDEX", "BAD_TURN_INDEX"]
    )
    assert (errs["severity"] == "error").all()


def test_good_rows_unaffected(spark, dirty, transcripts_pdf):
    from engine.schema import TRANSCRIPT_SCHEMA
    from tests.compare import KEYS, assert_frames_match

    df, n_good = dirty
    f_dirty, _, _ = extract_features(spark, df)
    clean_df = spark.createDataFrame(
        transcripts_pdf.head(200), schema=TRANSCRIPT_SCHEMA
    )
    f_clean, _, _ = extract_features(spark, clean_df)
    assert_frames_match(
        f_dirty.toPandas(),
        f_clean.toPandas(),
    )
