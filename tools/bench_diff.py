#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares two committed bench artifacts (BENCH_LOCAL_r{N}.json shape:
{"queries": {name: seconds, ...}, "failed": [...], ...}) and flags
every shared query whose wall time regressed by more than THRESHOLD x,
every query that newly failed, and every query that disappeared.

Usage: python3 tools/bench_diff.py BENCH_LOCAL_r7.json target/bench.json
Exit status 1 iff any regression/new-failure/disappearance is flagged,
so the round-close checklist can gate on it.

Noise guards: queries faster than MIN_SECS in BOTH runs are never
flagged (sub-100ms timings are scheduler jitter, not plans), and the
report prints the absolute delta so a 0.05->0.12s "3x regression" is
visibly different from a 5->12s one.
"""
import json
import sys

THRESHOLD = 2.0
MIN_SECS = 0.15


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    flagged = []

    new_failed = set(new.get("failed", [])) - set(old.get("failed", []))
    for name in sorted(new_failed):
        flagged.append(f"NEW FAILURE  {name}")

    for name in sorted(set(oq) - set(nq)):
        flagged.append(f"DISAPPEARED  {name} (was {oq[name]:.2f}s)")

    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a < 0 or b < 0:  # failure sentinel — handled above
            continue
        if max(a, b) < MIN_SECS:
            continue
        if b > a * THRESHOLD:
            # a == 0.0 (instant/rounded old timing) must still flag,
            # not crash the gate with ZeroDivisionError
            ratio = b / a if a > 0 else float("inf")
            flagged.append(
                f"REGRESSION   {name}: {a:.2f}s -> {b:.2f}s "
                f"({ratio:.1f}x, +{b - a:.2f}s)")

    added = sorted(set(nq) - set(oq))
    tot_o = sum(v for v in oq.values() if v >= 0)
    tot_n = sum(v for v in nq.values() if v >= 0)
    shared = [n for n in set(oq) & set(nq) if oq[n] >= 0 and nq[n] >= 0]
    sh_o = sum(oq[n] for n in shared)
    sh_n = sum(nq[n] for n in shared)
    print(f"old: {len(oq)} queries / {tot_o:.1f}s   "
          f"new: {len(nq)} queries / {tot_n:.1f}s")
    print(f"shared {len(shared)}: {sh_o:.1f}s -> {sh_n:.1f}s "
          f"({sh_n / sh_o:.2f}x)" if shared and sh_o > 0 else "no shared queries")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if flagged:
        print(f"\n{len(flagged)} flagged (> {THRESHOLD}x over {MIN_SECS}s):")
        for line in flagged:
            print("  " + line)
        return 1
    print(f"\nno regressions > {THRESHOLD}x")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2]))
