"""Per-turn text invariant: clean_text X1-X7 semantics, engine ==
oracle == hand-computed goldens (SURVEY.md §2.8, §5.2)."""

import pandas as pd

from engine.functions.text import clean_text_py


def test_x2_char_substitutions():
    assert clean_text_py("r0ute 1 plan 5") == "rOute I plan S"
    assert clean_text_py("a—b–c") == "a-b-c"
    assert clean_text_py("‘x’ “y”") == "'x' \"y\""


def test_x1_lines_and_x4_whitespace():
    # NB: X3 (drop non-printable) runs BEFORE X4 (collapse whitespace),
    # so a tab is *dropped* ('\t'.isprintable() is False), not spaced —
    # faithful to the reference's step order (text_extractor.py:328-329).
    assert clean_text_py("  a  \n\n  b\tc  \n") == "a\nbc"
    assert clean_text_py("multi   space") == "multi space"


def test_x3_nonprintable_dropped():
    assert clean_text_py("bad\x00char") == "badchar"
    assert clean_text_py("a\x07b") == "ab"


def test_x5_punctuation_whitelist():
    assert clean_text_py("str@nge#sym$bols% ok.,!?:;'\"-") == "strngesymbols ok.,!?:;'\"-"
    # unicode ellipsis is printable but outside whitelist → dropped
    assert clean_text_py("café…") == "café"


def test_x5_empty_cleaned_line_dropped():
    # a line the X5 whitelist reduces to '' is dropped entirely, not
    # kept as an empty line (reference `if final_line:` semantics,
    # text_extractor.py:333-336)
    assert clean_text_py("hello\n@#$%^&*\nworld") == "hello\nworld"
    assert clean_text_py("@#$") == ""
    # a line that reduces to whitespace-only is truthy → kept
    assert clean_text_py("@ #") == " "


def test_null_and_empty():
    assert clean_text_py(None) is None
    assert clean_text_py("") == ""
    assert clean_text_py("   \n  ") == ""


def test_engine_matches_oracle_per_turn(spark, transcripts_df, transcripts_pdf):
    """Per-turn text equality under stable (conv_id, turn_idx) order."""
    from engine.pipeline import add_text_features

    got = (
        add_text_features(transcripts_df)
        .select("conv_id", "turn_idx", "clean_text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    from engine.functions.text import clean_text_series

    exp_clean = clean_text_series(exp["text"])
    for i in range(len(got)):
        a, b = got["clean_text"].iat[i], exp_clean.iat[i]
        assert (pd.isna(a) and pd.isna(b)) or a == b, (
            f"row {i} ({got['conv_id'].iat[i]},{got['turn_idx'].iat[i]}): {a!r} != {b!r}"
        )


def test_quality_score_null_text_scores_like_empty(spark):
    """NULL text must score as contentless (0.3, 'low'), not collect
    full length credit via ANSI size(NULL) + least's null-skipping
    (round-3 review: it scored 0.7 → 'high')."""
    from engine.functions.docs import quality_score
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "real text with some actual words here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["q"]
        for r in df.select(
            "doc_id", F.round(quality_score(F.col("text")), 6).alias("q")
        ).collect()
    }
    assert got[0] == got[1] == 0.3
    assert got[2] > 0.3


def test_pii_redact_counts_and_scrub(spark):
    """PII pass: counts match the planted spans and redaction leaves
    no residual matches (counting the redacted text yields zeros)."""
    from engine.functions.docs import pii_counts, pii_redact
    from pyspark.sql import functions as F

    rows = [
        (0, "mail bob.smith+x@sub.example.org and boss@corp.io today"),
        (1, "call 555-867-5309 or 800-123-4567 x9"),
        (2, "hosts 10.0.0.1 and 192.168.254.7 up"),
        (3, "none here: a@b (no tld), 12-345-6789, 1.2.3"),
        (4, None),
        (5, "mixed a.b@c.de then 555-000-1111 at 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.coalesce(F.col("text"), F.lit(""))
    sel = [c.alias(f"n_{k}") for k, c in pii_counts(t)]
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select("doc_id", *sel, pii_redact(t).alias("red")).collect()
    }
    assert (got[0]["n_emails"], got[0]["n_phones"], got[0]["n_ips"]) == (2, 0, 0)
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (0, 2, 0)
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (0, 0, 2)
    assert (got[3]["n_emails"], got[3]["n_phones"], got[3]["n_ips"]) == (0, 0, 0)
    # NULL text: counts coalesce to 0 and redaction to '' (round-5
    # advice #4 — the null-handling path was created but unasserted)
    assert (got[4]["n_emails"], got[4]["n_phones"], got[4]["n_ips"]) == (0, 0, 0)
    assert got[4]["red"] == ""
    assert (got[5]["n_emails"], got[5]["n_phones"], got[5]["n_ips"]) == (1, 1, 1)
    assert got[5]["red"] == "mixed [EMAIL] then [PHONE] at [IP]"
    # idempotence/completeness: re-counting the redacted text finds nothing
    red = df.select(pii_redact(t).alias("text"))
    resid = red.select(
        *[c.alias(f"n_{k}") for k, c in pii_counts(F.col("text"))]
    ).agg(
        F.sum("n_emails").alias("e"), F.sum("n_phones").alias("p"),
        F.sum("n_ips").alias("i"),
    ).first()
    assert (resid["e"], resid["p"], resid["i"]) == (0, 0, 0)
