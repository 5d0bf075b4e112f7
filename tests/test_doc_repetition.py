"""Repetition quality signal: hand-computed ratios on planted docs
(the gate's natural corpus has mild repetition only, so the repetitive
branch needs plants), null/blank/short-text edges."""

from __future__ import annotations

import pytest


def _run(spark, rows):
    import engine.doc_queries as DQ

    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = DQ._heavy
    DQ._heavy = lambda s, sf, name: df
    try:
        return {r["doc_id"]: r for r in DQ.q_doc_repetition(spark, "x").collect()}
    finally:
        DQ._heavy = orig


def test_repetition_ratios_hand_computed(spark):
    rows = [
        (1, "a b c a b c a b c a b c"),      # heavy 3-gram repetition
        (2, "one two three four five six"),  # all distinct
        (3, None),
        (4, "   "),
        (5, "two words"),
    ]
    out = _run(spark, rows)
    # doc 1: 12 tokens → 10 grams; distinct grams = 3 ('a b c','b c a',
    # 'c a b') → dup = 7/10; top gram 'a b c' appears 4x → share 0.4
    assert out[1]["n_ngrams"] == 10
    assert out[1]["dup_ngram_ratio"] == pytest.approx(0.7)
    assert out[1]["top_ngram_share"] == pytest.approx(0.4)
    assert out[1]["repetitive"] is True
    # doc 2: 4 grams, all distinct; top share 0.25 but n < 20 → the
    # min-length gate keeps short docs from trivially tripping it
    assert out[2]["n_ngrams"] == 4
    assert out[2]["dup_ngram_ratio"] == 0.0
    assert out[2]["top_ngram_share"] == pytest.approx(0.25)
    assert out[2]["repetitive"] is False
    # long doc dominated by one gram → repetitive via top share
    long_rows = [(6, "x y " + "foo bar baz " * 12)]  # 38 toks → 36 grams
    out6 = _run(spark, long_rows)[6]
    assert out6["n_ngrams"] == 36 and out6["repetitive"] is True
    assert out6["top_ngram_share"] > 0.18
    # null / blank / short → all-zero row, not an error
    for d in (3, 4, 5):
        assert out[d]["n_ngrams"] == 0
        assert out[d]["dup_ngram_ratio"] == 0.0
        assert out[d]["top_ngram_share"] == 0.0
        assert out[d]["repetitive"] is False
