"""Driver-entry contract invariants (no Spark session needed).

The driver records only the FIRST 50 ``queries()`` entries into each
round's CORRECTNESS file, so the window ordering is load-bearing: these
tests assert the window's PROPERTIES (never-driver-verified gates first,
the 10-gate core canary always inside, no duplicates, deterministic
order) rather than a literal list — the driver's own grading legitimately
rotates fresh gates into the window every round, so a pinned list would
go stale by construction each time it did its job (r5 verdict #1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def _window():
    return list(entry.queries().keys())[:50]


def test_window_50_has_canary_and_no_duplicates():
    names = _window()
    assert len(names) == 50
    assert len(set(names)) == 50
    # the 10-gate core canary must sit inside the graded window every round
    for c in entry._CORE_CANARY:
        assert c in names, f"canary gate {c} rotated out of the window"


def test_window_50_is_never_verified_first():
    """Every non-canary slot in the window must be a gate with no prior
    fully-green driver verification — the rotation's whole purpose — unless
    the fresh queue has drained below 40 (then verified gates backfill)."""
    verified = entry._driver_verified()
    canary = set(entry._CORE_CANARY)
    names = _window()
    all_names = list(entry.queries().keys())
    n_fresh_available = sum(
        1 for n in all_names if n not in verified and n not in canary
    )
    fresh_in_window = [n for n in names if n not in canary]
    expect_fresh = min(50 - len(canary & set(names)), n_fresh_available)
    actually_fresh = sum(1 for n in fresh_in_window if n not in verified)
    assert actually_fresh >= min(expect_fresh, len(fresh_in_window)), (
        "verified gates displaced never-verified gates from the window"
    )


def test_window_50_is_deterministic():
    assert _window() == _window()
    # priority-listed fresh gates keep their hand-ranked relative order
    names = _window()
    verified = entry._driver_verified()
    prio = [
        n for n in entry._FRESH_PRIORITY
        if n in names and n not in verified and n not in set(entry._CORE_CANARY)
    ]
    in_window_order = [n for n in names if n in set(prio)]
    assert in_window_order == prio


def test_every_query_has_a_full_duckdb_oracle():
    q, o = entry.queries(), entry.oracle_sql()
    missing = sorted(set(q) - set(o))
    assert not missing, f"rows-only gates appeared: {missing}"
    extra = sorted(set(o) - set(q))
    assert extra == [], f"oracles without queries: {extra}"


def test_registry_has_no_duplicate_slots_and_expected_size():
    names = list(entry.queries().keys())
    assert len(names) == len(set(names))
    assert len(names) >= 228  # grows only; shrinking loses graded rows


def test_oracles_are_nonempty_sql():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
