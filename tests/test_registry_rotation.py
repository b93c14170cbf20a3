"""Registry rotation staleness guard (VERDICT r07 'do this' #7).

The driver records the FIRST 50 entries of ``queries()`` per round.
These tests prove the closed loop: with the record-history-driven
ordering (stalest first), every registered query re-records within
ceil(n / 50) rounds — simulated forward from the REAL checked-in
CORRECTNESS history, so a regression in either the ordering or the
history parsing fails CI here. No Spark session needed.
"""

from __future__ import annotations

import math

from newsmaper_etl_spark.records import latest_round, record_history
from newsmaper_etl_spark.registry import (
    QUERIES,
    REPLANNED,
    _ensure_loaded,
    _record_order,
    driver_specs,
)

CAP = 50


def test_history_parses_and_covers_registry():
    """Every checked-in record name is (or was) a registry query, the
    latest round is sane, and the bulk of the current registry carries
    a record (only genuinely new queries may lack one)."""
    _ensure_loaded()
    hist = record_history()
    assert latest_round() >= 7
    assert len(hist) >= 100
    unrecorded = set(QUERIES) - set(hist)
    # new-this-round queries only — the backlog must stay well inside
    # ONE driver window (50/round) so every new query records next
    # round; r14 added 12 (PSL/merge-rank/domains + the selection,
    # clustering, and bpe-train families), hence the bound at 16
    assert len(unrecorded) <= 16, sorted(unrecorded)


def _group(n, hist, bound, next_rnd):
    """The r16 ordering groups (mirrors registry._record_order): (0/1)
    unrecorded, (2) DEFERRED REPLANNED (dirty and already missed one
    window), (3) recorded at/over the rotation deadline, (4) fresh
    REPLANNED, (5) clean."""
    rec = hist.get(n)
    if rec is None:
        return 0
    dirty = rec["round"] < REPLANNED.get(n, 0)
    if dirty and next_rnd - REPLANNED[n] >= 1:
        return 2
    if next_rnd - rec["round"] >= bound:
        return 3
    if dirty:
        return 4
    return 5


def test_order_puts_new_then_deferred_dirty_then_deadline_then_stalest():
    """Priority proof for the r16 ordering: unrecorded queries lead,
    DEFERRED dirty REPLANNED entries next (a shipped plan the driver
    has never hashed must not miss a second window — ADVICE r15 #4),
    then queries at the rotation deadline, then fresh REPLANNED, then
    the clean block stalest-first; each recorded group is itself
    ascending by record round."""
    _ensure_loaded()
    hist = record_history()
    visible = driver_specs()
    order = _record_order(visible)
    assert sorted(order) == sorted(visible)
    bound = math.ceil(len(visible) / CAP)
    next_rnd = latest_round() + 1
    groups = [_group(n, hist, bound, next_rnd) for n in order]
    assert groups == sorted(groups), "ordering violates group priority"
    for g in (2, 3, 4, 5):
        rounds = [
            hist[n]["round"] for n, gg in zip(order, groups) if gg == g
        ]
        assert rounds == sorted(rounds), f"group {g} not stalest-first"


def test_replanned_entries_are_live_and_self_expiring():
    """Every REPLANNED entry names a real driver-visible query, targets
    a round the driver hasn't recorded it at yet (else it's expired and
    must be dropped), and the whole dirty set fits in one driver window
    alongside genuinely new queries — a dirty set that big would starve
    the stalest-first rotation."""
    _ensure_loaded()
    hist = record_history()
    visible = driver_specs()
    for name, rnd in REPLANNED.items():
        assert name in visible, f"REPLANNED entry {name} not in registry"
        rec = hist.get(name)
        assert rec is None or rec["round"] < rnd, (
            f"REPLANNED entry {name} expired (recorded r{rec['round']} "
            f">= {rnd}) — drop it"
        )
        assert rnd <= latest_round() + 1, name
    new = [n for n in visible if n not in hist]
    # r16 invariants (ADVICE r15 #4 structural fix):
    # 1. the NEXT window contains every unrecorded query AND every
    #    DEFERRED dirty REPLANNED entry (a shipped plan the driver has
    #    never hashed must not miss a second window);
    # 2. deadline entries fill the remaining slots; any spill beyond
    #    the cap is bounded by the dirty-set size and heads the NEXT
    #    window (so the age bound degrades by at most one round, and
    #    only in rounds whose deadline block plus dirty set overflow
    #    the cap).
    bound = math.ceil(len(visible) / CAP)
    next_rnd = latest_round() + 1
    order = _record_order(visible)
    window = set(order[:CAP])
    deadline = {
        n for n in visible
        if n in hist and next_rnd - hist[n]["round"] >= bound
    }
    dirty = {n for n in REPLANNED if n in hist
             and hist[n]["round"] < REPLANNED[n]}
    deferred = {n for n in dirty if next_rnd - REPLANNED[n] >= 1}
    assert set(new) <= window, sorted(set(new) - window)
    assert deferred <= window, sorted(deferred - window)
    assert len(new) + len(deferred) <= CAP, (
        "window cannot fit the non-deferrable sets"
    )
    spilled = deadline - window
    assert len(spilled) <= len(deferred), sorted(spilled)
    first_two = set(order[: 2 * CAP])
    assert deadline <= first_two, sorted(deadline - first_two)
    assert dirty <= first_two, sorted(dirty - first_two)


def test_simulated_rotation_bounds_record_age():
    """Forward-simulate the driver from the real current history: each
    round records the first CAP entries of the live ordering and the
    history advances. Over 10 rounds, no oracle query's record may age
    beyond ceil(n / CAP) rounds — the bound RECORDS.md quotes."""
    _ensure_loaded()
    hist = {n: dict(v) for n, v in record_history().items()}
    visible = driver_specs()
    bound = math.ceil(len(visible) / CAP)
    current = latest_round()

    def order_for(h, next_rnd):
        # mirrors registry._record_order (r16 deferred-dirty-first
        # form), REPLANNED included so the simulation exercises the
        # real ordering: entries self-expire as the simulated history
        # advances past their round.
        def key(n, idx):
            rec = h.get(n)
            if rec is None:
                return (0 if visible[n].oracle is not None else 1, 0, idx)
            dirty = rec["round"] < REPLANNED.get(n, 0)
            if dirty and next_rnd - REPLANNED[n] >= 1:
                return (2, rec["round"], idx)
            if next_rnd - rec["round"] >= bound:
                return (3, rec["round"], idx)
            if dirty:
                return (4, rec["round"], idx)
            return (5, rec["round"], idx)
        names = list(visible)
        return sorted(names, key=lambda n: key(n, names.index(n)))

    worst = 0
    for rnd in range(current + 1, current + 11):
        for name in order_for(hist, rnd)[:CAP]:
            hist[name] = {"round": rnd}
        # after the backlog drains (bound rounds), enforce the bound
        if rnd >= current + bound:
            for name, spec in visible.items():
                if spec.oracle is None:
                    continue
                age = rnd - hist.get(name, {"round": rnd - 99})["round"]
                worst = max(worst, age)
                assert age <= bound, (
                    f"{name} would be {age} rounds stale at r{rnd} "
                    f"(bound {bound}) — rotation broken"
                )
    assert worst > 0  # the simulation actually exercised aging


def test_generator_tool_passes_on_current_tree():
    """tools/gen_records_table.py must exit 0 against the checked-in
    history (an over-aged oracle query NOT scheduled for the next round
    fails it) and regenerate RECORDS.md deterministically."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(root / "tools" / "gen_records_table.py")],
        capture_output=True, text=True, cwd=str(root),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert (root / "RECORDS.md").exists()
