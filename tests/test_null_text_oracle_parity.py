"""Engine-vs-oracle parity on NULL/blank text documents — the fixture
tables happen to contain none, so these latent divergences (round-3
review: langid ELSE-'fr' fallthrough, simhash row drop, regex ''-vs-
NULL) never hit the driver gate. This test plants them."""

from __future__ import annotations

import duckdb
import pytest


QUERIES = [
    "doc_langid", "dedup_simhash", "doc_regex_extract", "doc_quality",
    # round-4 additions: NULL text must yield a NULL_PAYLOAD error row
    # in multimodal (the codegen concat nulls the payload), all-zero
    # repetition rows, and no contamination pairs — in BOTH checkers
    "multimodal_meta", "doc_repetition", "doc_contamination",
    # round-6: the chunked long-doc n=13 core must handle NULL/blank
    # text identically (short/empty token arrays emit no chunks)
    "doc_contamination13",
]


@pytest.fixture(scope="module")
def null_doc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nulldocs")
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog", "en", "web"),
            (2, None, None, "web"),
            (3, "", "en", "web"),
            (4, "der und die das ist ein", "de", "crawl"),
            (5, "   ", "en", "crawl"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_null_text_parity(spark, null_doc_dir):
    import __spark_entry__ as entry
    from tests.compare import assert_frames_match

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{null_doc_dir}/documents.parquet/*.parquet'"
    )
    for name in QUERIES:
        got = qs[name](spark, null_doc_dir).toPandas()
        exp = con.execute(oracles[name]).df()
        try:
            assert_frames_match(got, exp, keys=["doc_id"])
        except AssertionError as e:
            raise AssertionError(f"{name}: {e}") from e
