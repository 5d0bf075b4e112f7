"""Differential pin for the round-6 chunked contamination core: on a
synthetic long-doc corpus (docs far longer than chunk_tokens, with
repeated grams spanning chunk boundaries) the chunk-parallel core must
produce byte-identical pairs to the original per-doc broadcast core."""

from __future__ import annotations


def _rows(df):
    return sorted(
        (r["doc_id"], r["bench_id"], r["n_shared_ngrams"]) for r in df.collect()
    )


def test_chunked_core_matches_per_doc_core(spark):
    from engine.doc_queries import (
        _contamination_pairs,
        _contamination_pairs_chunked,
    )

    # 8 docs x ~700 tokens with heavy overlap: doc i shares a sliding
    # vocabulary window with doc i+2, and every doc repeats a common
    # refrain so the same gram appears in MANY chunks of one doc (the
    # collect_set-dedup path) and across bench/corpus docs.
    docs = []
    refrain = " ".join(f"r{j}" for j in range(20))
    for i in range(8):
        toks = []
        for b in range(10):
            toks.append(refrain)
            toks.append(" ".join(f"w{i + 2 * b}_{j}" for j in range(45)))
        docs.append((i, " ".join(toks)))
    docs.append((8, None))        # null text
    docs.append((9, "   "))       # whitespace only
    docs.append((10, "a b c"))    # shorter than n
    d = spark.createDataFrame(docs, "doc_id long, text string")

    base = _rows(_contamination_pairs(d, n=5, bench_mod=3, clone_offset=100))
    # chunk_tokens far below doc length forces many chunks per doc and
    # grams duplicated across chunk overlaps
    chunked = _rows(
        _contamination_pairs_chunked(
            d, n=5, bench_mod=3, clone_offset=100, n_part=8, chunk_tokens=32
        )
    )
    assert base == chunked
    assert len(base) > 0, "fixture must actually produce pairs"
