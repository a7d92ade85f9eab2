#!/usr/bin/env python3
"""Diff two Bench JSON artifacts (BENCH_LOCAL.json / BENCH_r{N}.json) with
the round-verdict adjudication rules applied mechanically, so the
epoch-vs-epoch analysis that used to happen in prose is one command:

  1. LOAD CALIBRATION: each epoch carries a fixed-size machine probe
     (min-of-2, pre and post). Cross-epoch query ratios are divided by the
     calibration ratio before being read as regressions — a loaded machine
     smears every query uniformly (the round-7 and round-15 lesson). A
     pre/post disagreement > 1.3x inside one epoch flags load ARRIVING
     mid-run (that epoch's per-query numbers are suspect).
  2. METHOD EXCLUSIONS: a query listed in `eager_rebuilt_per_rep` in one
     epoch but not the other changed its measurement method (cache re-read
     -> honest rebuild); its delta is expected and excluded from the
     regression verdict, as is everything when the `method` fields differ.
  3. NOISE FLOOR: a mover is named only when the LOAD-ADJUSTED ratio
     exceeds 1.3x AND the absolute delta exceeds 0.15 s (sub-second
     queries jitter multiples on a shared machine; tiny absolute deltas
     never matter at any scale).

Exit code: 0 when no unexcluded regression survives the rules, 1 otherwise.

Usage: python3 tools/bench_compare.py <old.json> <new.json>
"""
import json
import sys

RATIO = 1.3
ABS_DELTA = 0.15


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def cal_of(epoch):
    # mean of pre/post: a single scalar cannot model load ARRIVING or
    # LEAVING mid-run (that's what the disagreement WARNING is for — the
    # honest fix is rerunning the suspect epoch on a quiet machine), but
    # the mean is the least-wrong stationary estimate
    c = epoch.get("calibration")
    if not c:
        return None
    return (c["pre"] + c["post"]) / 2


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]

    # rule 1: load calibration
    ocal, ncal = cal_of(old), cal_of(new)
    cal_ratio = (ncal / ocal) if (ocal and ncal) else 1.0
    for tag, e in (("old", old), ("new", new)):
        c = e.get("calibration")
        if c and max(c.values()) / min(c.values()) > RATIO:
            print(f"WARNING: {tag} epoch calibration pre/post disagree "
                  f"({c['pre']:.2f}/{c['post']:.2f}) — load arrived mid-run, "
                  f"its per-query numbers are suspect")
    if ocal and ncal:
        print(f"calibration: old {ocal:.2f}s, new {ncal:.2f}s "
              f"(load ratio {cal_ratio:.2f}x — query ratios divided by this)")

    # self-heal visibility: an epoch that re-ran load-poisoned outliers
    # (Bench's reference-exceeding rule) says so in the artifact
    for tag, e in (("old", old), ("new", new)):
        rr = e.get("rerun") or {}
        if rr:
            healed = ", ".join(f"{k}={v:.2f}s" for k, v in sorted(rr.items()))
            print(f"note: {tag} epoch self-healed {len(rr)} load-poisoned "
                  f"quer{'y' if len(rr) == 1 else 'ies'}: {healed}")

    # rule 2: method exclusions
    method_changed = old.get("method") != new.get("method")
    if method_changed:
        print(f"WARNING: method changed ({old.get('method')} -> "
              f"{new.get('method')}) — every delta excluded from the verdict")
    o_eager = set(old.get("eager_rebuilt_per_rep", []))
    n_eager = set(new.get("eager_rebuilt_per_rep", []))
    eager_flipped = o_eager ^ n_eager

    regressions, rows = [], []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            if b < 0:
                # a query that is new AND failing must affect the verdict —
                # without this it would print as NEW and exit 0
                rows.append((float("inf"), f"{name:32s} NEW+FAILED ({b:.2f})"))
                regressions.append(name)
            else:
                rows.append((float("inf"), f"{name:32s} NEW      {b:8.2f}s"))
            continue
        if b is None:
            rows.append((float("-inf"), f"{name:32s} REMOVED {a:8.2f}s"))
            continue
        if a < 0 or b < 0:
            rows.append((float("inf"), f"{name:32s} FAILED   ({a:.2f} -> {b:.2f})"))
            if b < 0 <= a:
                regressions.append(name)
            continue
        adj = (b / a / cal_ratio) if a > 0 else float("inf")
        delta = b - a
        mover = adj > RATIO and delta > ABS_DELTA
        faster = adj < 1 / RATIO and delta < -ABS_DELTA
        note = ""
        if name in eager_flipped:
            note = "  [method-change: eager-rebuild flag flipped — excluded]"
        elif method_changed:
            note = "  [method-change — excluded]"
        elif mover:
            note = "  <-- REGRESSION (survives calibration + noise floor)"
            regressions.append(name)
        elif faster:
            note = "  (real improvement)"
        if mover or faster or name in eager_flipped:
            rows.append((delta, f"{name:32s} {a:8.2f}s -> {b:8.2f}s  "
                         f"({delta:+.2f}s, adj {adj:.2f}x){note}"))
    print(f"\nnamed movers (|adj ratio| > {RATIO}x and |delta| > {ABS_DELTA}s):"
          if rows else "\nno named movers — every query inside the noise rules")
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)

    print(f"\ntotal: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] - old['value']:+.1f}s raw, "
          f"{new['value'] / old['value'] / cal_ratio:.2f}x load-adjusted)")
    if regressions and not method_changed:
        print(f"VERDICT: {len(regressions)} real regression(s): "
              f"{', '.join(regressions)}")
        return 1
    print("VERDICT: zero real regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
