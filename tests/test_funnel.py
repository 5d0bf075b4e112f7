"""Ordered multi-step funnel (view → click → purchase): each step only
counts when it happens STRICTLY after the earliest qualifying previous
step inside the same session. Planted sessions pin every branch the
sf-table driver check can't discriminate (its full-funnel count is
legitimately 0 on sparse sessions)."""

from __future__ import annotations

from datetime import datetime, timedelta

from engine.queries import funnel_steps

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ev(user_id, event_id, secs, etype):
    return (event_id, T0 + timedelta(seconds=secs), user_id, etype, 1.0, "{}")


def test_funnel_strict_ordering(spark):
    rows = [
        # user 1: full ordered funnel in one session
        _ev(1, 10, 0, "view"), _ev(1, 11, 10, "click"), _ev(1, 12, 20, "purchase"),
        # user 2: click BEFORE the first view → step 2 never reached,
        # even though a click and a later purchase exist
        _ev(2, 20, 0, "click"), _ev(2, 21, 10, "view"), _ev(2, 22, 20, "purchase"),
        # user 3: view then purchase but no click → stops at step 1
        _ev(3, 30, 0, "view"), _ev(3, 31, 10, "purchase"),
        # user 4: click at the SAME second as the view → strict > fails
        _ev(4, 40, 0, "view"), _ev(4, 41, 0, "click"), _ev(4, 42, 10, "purchase"),
        # user 5: full funnel split across TWO sessions (purchase after
        # a >1800 s gap) → the purchase lands in a view-less session
        _ev(5, 50, 0, "view"), _ev(5, 51, 10, "click"), _ev(5, 52, 2000, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = funnel_steps(ev).first()
    assert r["n_sessions"] == 6  # user 5 contributes two
    assert r["n_view"] == 5      # users 1-4 + user 5's first session
    assert r["n_view_click"] == 2            # users 1 and 5 only
    assert r["n_view_click_purchase"] == 1   # user 1 only
    assert r["full_funnel_rate"] == round(1 / 6, 6)
