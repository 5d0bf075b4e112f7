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
