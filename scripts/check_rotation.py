"""Machine-check the registry-rotation cadence invariant.

The driver's correctness gate samples the FIRST 50 entries of
``__spark_entry__.queries()`` each round. With N registry entries the
three-round union of the old protocol cannot cover N > 150, so the r8
protocol is a cadence: every entry gets a driver-side CORRECTNESS row at
least every ``K = ceil(N / 50)`` rounds, with the full-registry local
oracle gate + the pytest SUBSET as the every-round bridge.

This script FAILS (exit 1) when the current registry order breaks that:

1. every never-driver-verified entry must be inside the upcoming window
   (the first 50);
2. every entry whose last green row is >= K rounds old at the upcoming
   round must be inside the window;
3. greedy forward simulation (each future window = the 50 stalest) must
   never let any entry's staleness exceed K rounds — i.e. the current
   order leaves a feasible schedule, not just a legal next step;
4. the four seeded rows-only entries stay adjacent to their
   value-checked twins (the driver records rows-only checks for them, so
   the twin must land in the same window).

``--plan`` additionally prints the projected next-round window head (the
50 stalest entries after the upcoming round is assumed green), which is
the deterministic rotation plan for the next session.

Sustainability policy (r9, the registry-growth decision): the registry
may keep growing PAST 50 × 3 because the cadence K = ceil(N/50) grows
with it — the driver-side window is a spot-check cadence, not the
correctness gate. The every-round full gate is LOCAL: pytest runs the
complete registry against DuckDB at sf0.001 (subset per-query at each
run, full sweep via run_gate at round close), so every entry is
value-checked every round regardless of its driver cadence. Growth
budget per round = 50 − (due entries + code-changed re-verifications) —
the checker's greedy simulation (2·K + 1 rounds ahead, i.e. through at
least r18 from r9) FAILS the build when a planned order leaves any
entry unable to meet its cadence, and that failure is the trigger to
consolidate near-twin gates (fold multiple operators into one
value-checked query where their oracles compose) in the NEXT session's
first commit, exactly like the cadence trigger itself. Hash-failed rows
count as UNVERIFIED (r8 lesson) and re-enter the head immediately.

No Spark session is needed: the registry order is parsed from the
``queries()`` source and history from ``CORRECTNESS_r*.json``.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50
# r12: the four seeded rows-only entries were folded into value-checked
# compounds (minhash_gate, simhash_gate) or retired in favor of the recall
# gates that already execute them (lsh_recall, ann_recall) — the registry
# carries zero rows-only entries, so no adjacency pins remain.
TWINS: list[tuple[str, str]] = []


def registry_order() -> list[str]:
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    if not m:
        raise SystemExit("could not locate queries() return dict")
    names = re.findall(r'"([a-z0-9_]+)":', m.group(1))
    if len(names) != len(set(names)):
        raise SystemExit("duplicate registry keys")
    return names


def last_verified() -> tuple[dict[str, int], int]:
    """Map query -> last round with a green (or protocol rows-only) driver
    row, and the latest recorded round."""
    last: dict[str, int] = {}
    latest = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        latest = max(latest, rnd)
        for q, row in json.load(open(f)).items():
            # hash_match must be affirmatively True: a row that matches on
            # rows+schema but fails the value hash is NOT verified (the r8
            # lesson — four hash-red rows would otherwise look green to the
            # scheduler and be stranded for a full cadence)
            green = (row.get("rows_match") and row.get("schema_match")
                     and row.get("hash_match") is True)
            rows_only = row.get("err") and "no_oracle" in str(row["err"])
            if green or rows_only:
                last[q] = max(last.get(q, 0), rnd)
    return last, latest


def check(plan: bool = False) -> list[str]:
    order = registry_order()
    last, latest = last_verified()
    n = len(order)
    cadence = math.ceil(n / WINDOW)
    upcoming = latest + 1
    window = set(order[:WINDOW])
    errors: list[str] = []

    stale = {q: last.get(q, upcoming - cadence) for q in order}
    never = [q for q in order if q not in last]
    for q in never:
        if q not in window:
            errors.append(f"never-driver-verified entry outside window: {q}")
    for q in order:
        if q in last and upcoming - last[q] >= cadence and q not in window:
            errors.append(
                f"{q} last verified r{last[q]} would exceed the "
                f"{cadence}-round cadence at r{upcoming}")

    for a, b in TWINS:
        if a in order and b in order and abs(order.index(a) - order.index(b)) != 1:
            errors.append(f"rows-only entry {a} not adjacent to twin {b}")

    # Greedy forward feasibility: round `upcoming` uses the actual window;
    # later rounds take the 50 stalest. Nothing may age past `cadence`.
    sim = dict(stale)
    for q in never:
        sim[q] = upcoming - cadence  # oldest possible without breaching yet
    for rnd in range(upcoming, upcoming + 2 * cadence + 1):
        chosen = (order[:WINDOW] if rnd == upcoming
                  else sorted(order, key=lambda q: (sim[q], order.index(q)))[:WINDOW])
        for q in chosen:
            sim[q] = rnd
        breach = [q for q in order if rnd - sim[q] >= cadence]
        if breach:
            errors.append(
                f"greedy schedule infeasible: at r{rnd} these exceed the "
                f"{cadence}-round cadence: {breach[:5]}...")
            break

    if plan and not errors:
        after = dict(stale)
        for q in order[:WINDOW]:
            after[q] = upcoming
        nxt = sorted(order, key=lambda q: (after[q], order.index(q)))[:WINDOW]
        print(f"# projected r{upcoming + 1} window (50 stalest after "
              f"r{upcoming} goes green):")
        for q in nxt:
            print(f"  {q}  (last r{after[q]})")
    return errors


def main() -> int:
    errors = check(plan="--plan" in sys.argv)
    order = registry_order()
    last, latest = last_verified()
    if errors:
        for e in errors:
            print(f"ROTATION VIOLATION: {e}", file=sys.stderr)
        return 1
    print(f"rotation OK: {len(order)} entries, window {WINDOW}, "
          f"cadence {math.ceil(len(order) / WINDOW)} rounds, "
          f"history through r{latest}, "
          f"{sum(1 for q in order if q not in last)} never-verified "
          f"(all inside the upcoming window)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
