"""Pins for the bench harness's pair-selection policy (no Spark needed).

These encode the round-2 review findings: selection must never condition
on the gate outcome (a cleaner FAILING pair beats a dirtier PASSING one),
and missing interference evidence must rank dirtiest, not cleanest.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from bench import pair_dirt, pair_dirty, select_pair  # noqa: E402

FLOORS = dict(steal_floor=0.75, foreign_floor=2.0, spread_floor=1.3)


def _pair(eff, steal=0.1, foreign=0.0, spread=1.05):
    return {
        "efficiency": eff,
        "max_steal_pct": steal,
        "max_foreign_pct": foreign,
        "spread": spread,
    }


def test_first_clean_pair_wins_even_if_it_fails_the_gate():
    pairs = [
        _pair(0.55),            # clean but fails the 0.8 gate
        _pair(0.95),            # clean AND passes — but came second
    ]
    chosen, clean = select_pair(pairs, **FLOORS)
    assert clean and chosen["efficiency"] == 0.55


def test_all_dirty_least_dirty_wins_unconditionally():
    # round-2 finding: a dirtier pair that clears the gate must NOT be
    # preferred over a cleaner pair that fails it
    pairs = [
        _pair(0.95, steal=2.5),   # passes the gate, dirtier
        _pair(0.40, steal=0.9),   # fails the gate, least dirty
    ]
    chosen, clean = select_pair(pairs, **FLOORS)
    assert not clean and chosen["efficiency"] == 0.40


def test_none_evidence_ranks_dirtiest_not_cleanest():
    # round-2 finding: `steal or 0.0` ranked None as perfectly clean
    pairs = [
        _pair(0.9, steal=None, foreign=None),
        _pair(0.5, steal=5.0),
    ]
    chosen, clean = select_pair(pairs, **FLOORS)
    assert not clean and chosen["efficiency"] == 0.5
    assert pair_dirt(pairs[0]) == float("inf")
    assert pair_dirty(pairs[0], **FLOORS)


def test_spread_alone_marks_dirty_at_zero_steal_and_foreign():
    # the host's invisible capacity swings: throughput halves while steal
    # and foreign both read ~0 — spread is the only signal
    p = _pair(0.6, steal=0.0, foreign=0.0, spread=2.1)
    assert pair_dirty(p, **FLOORS)
    q = _pair(0.6, steal=0.0, foreign=0.0, spread=1.1)
    assert not pair_dirty(q, **FLOORS)
    # and spread participates in least-dirty ranking
    assert pair_dirt(p) > pair_dirt(q)


def test_missing_spread_key_is_tolerated():
    p = {"efficiency": 1.0, "max_steal_pct": 0.1, "max_foreign_pct": 0.0}
    assert not pair_dirty(p, **FLOORS)
