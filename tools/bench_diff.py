#!/usr/bin/env python3
"""Per-query bench regression gate.

Two modes:

1. Round-over-round (original): compare two committed bench artifacts
   (BENCH_LOCAL_r{N}.json shape: {"queries": {name: seconds, ...},
   "failed": [...], ...}) and flag every shared query whose wall time
   regressed by more than THRESHOLD x, every query that newly failed,
   and every query that disappeared.

     python3 tools/bench_diff.py BENCH_LOCAL_r7.json target/bench.json

2. Baseline manifest (--baseline): gate a fresh run against the
   COMMITTED per-query reference-wall manifest instead of last round's
   (possibly noise-inflated) artifact. The manifest pins each query's
   best quiet-host wall across committed local runs plus an absolute
   noise band, so a loaded-host round doesn't manufacture flags that
   need manual adjudication: a query flags only if it exceeds BOTH
   ref x THRESHOLD and ref + ABS_BAND seconds.

     python3 tools/bench_diff.py --baseline tools/bench_baseline.json target/bench.json

   Regenerate the manifest (per-query min across the given artifacts):

     python3 tools/bench_diff.py --make-baseline tools/bench_baseline.json BENCH_LOCAL_r7.json BENCH_LOCAL_r8.json ...

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
ABS_BAND = 0.5  # seconds over the reference a baseline flag also requires


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


def make_baseline(out_path, artifact_paths):
    """per-query min across artifacts (failures excluded) = the best
    wall this code has demonstrated on this host — the closest
    committed proxy for a quiet-host reference."""
    ref = {}
    for p in artifact_paths:
        for name, secs in load(p).get("queries", {}).items():
            if secs >= 0 and (name not in ref or secs < ref[name]):
                ref[name] = secs
    doc = {
        "queries": dict(sorted(ref.items())),
        "generated_from": artifact_paths,
        "threshold": THRESHOLD,
        "abs_band": ABS_BAND,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out_path}: {len(ref)} queries, "
          f"total {sum(ref.values()):.1f}s")
    return 0


def main_baseline(base_path, new_path):
    base, new = load(base_path), load(new_path)
    ref = base.get("queries", {})
    thr = base.get("threshold", THRESHOLD)
    band = base.get("abs_band", ABS_BAND)
    nq = new.get("queries", {})
    flagged = []

    failed = set(new.get("failed", []))
    for name in sorted(failed):
        flagged.append(f"FAILURE      {name}")
    # a failed query may be absent from the queries map — that is the
    # FAILURE above, not an additional disappearance
    for name in sorted(set(ref) - set(nq) - failed):
        flagged.append(f"DISAPPEARED  {name} (ref {ref[name]:.2f}s)")
    for name in sorted(set(ref) & set(nq)):
        a, b = ref[name], nq[name]
        if b < 0:
            continue  # failure sentinel — handled above
        if max(a, b) < MIN_SECS:
            continue
        if b > a * thr and b > a + band:
            ratio = b / a if a > 0 else float("inf")
            flagged.append(
                f"REGRESSION   {name}: ref {a:.2f}s -> {b:.2f}s "
                f"({ratio:.1f}x, +{b - a:.2f}s)")

    added = sorted(set(nq) - set(ref))
    shared = [n for n in set(ref) & set(nq) if nq[n] >= 0]
    sh_r = sum(ref[n] for n in shared)
    sh_n = sum(nq[n] for n in shared)
    print(f"baseline: {len(ref)} queries / {sum(ref.values()):.1f}s   "
          f"new: {len(nq)} queries / {sum(v for v in nq.values() if v >= 0):.1f}s")
    if shared and sh_r > 0:
        print(f"shared {len(shared)}: ref {sh_r:.1f}s -> {sh_n:.1f}s ({sh_n / sh_r:.2f}x)")
    if added:
        # visible, not silent: these rows have NO reference wall and are
        # not gated until --make-baseline is rerun over a current artifact
        print(f"WARNING — added but UNGATED until the baseline manifest "
              f"is regenerated ({len(added)}): {', '.join(added)}")
    if flagged:
        print(f"\n{len(flagged)} flagged (> {thr}x AND > +{band}s over ref, min {MIN_SECS}s):")
        for line in flagged:
            print("  " + line)
        return 1
    print(f"\nno regressions beyond the baseline band")
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--make-baseline":
        sys.exit(make_baseline(sys.argv[2], sys.argv[3:]))
    if len(sys.argv) == 4 and sys.argv[1] == "--baseline":
        sys.exit(main_baseline(sys.argv[2], sys.argv[3]))
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2]))
