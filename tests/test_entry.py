"""Driver-contract consistency: queries()/oracle_sql() stay aligned
(every oracle has a query; rows-only entries are the documented set),
and each query function is importable and planable on sf0.001 without
running a job where possible."""

from __future__ import annotations

import importlib.util


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entrymod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


ROWS_ONLY = {"rolling_approx"}  # sketch values are engine-specific


def test_oracle_keys_align():
    m = _entry()
    q = set(m.queries())
    o = set(m.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"
    assert q - o == ROWS_ONLY, f"unexpected rows-only entries: {q - o}"


def test_oracles_are_nonempty_sql():
    m = _entry()
    for name, sql in m.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_rows_only_entries_document_why():
    """A query exempted from the oracle gate must say so in its own
    docstring — the exemption is part of the contract, not a loophole."""
    m = _entry()
    for name in ROWS_ONLY:
        doc = m.queries()[name].__doc__ or ""
        assert "rows-only" in doc, f"{name}: undocumented rows-only exemption"


def test_every_query_is_nonvacuous(spark):
    """Every driver-gate query returns rows at sf0.001 — a green
    oracle comparison over 0-vs-0 rows proves nothing (the r2
    dedup_embedding lesson: an operator that unconditionally returned
    nothing would still 'pass'). Any future query whose natural result
    is empty must plant a fixture inside the query, as the dedup/
    similarity queries do."""
    m = _entry()
    for name, fn in m.queries().items():
        assert fn(spark, "/root/testdata/sf0.001").count() > 0, (
            f"{name}: vacuous at sf0.001"
        )
