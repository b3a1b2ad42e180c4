#!/usr/bin/env python3
"""Full-surface scale-soak analysis: sf1 bench vs sf0.1 bench.

Usage: python3 tools/scale_ratio.py <bench_sf01.json> <bench_sf1.json>
       [ratio_threshold]

Reads two graft.Bench JSON lines (the files may be raw run logs — the
last line that parses as JSON with a "queries" object is used), joins
per-key min times, and prints every key whose sf1/sf0.1 ratio exceeds
the threshold (default 10.0 — the "linear in data size for 10x data"
bar), sorted by ratio. Keys faster than 0.3 s at BOTH SFs are skipped:
at that range the time is job-scheduling overhead, and a 0.05->0.6 s
move says nothing about data-volume scaling.

This is the sweep that caught r16's constant-IVF-cell-count O(SF^2)
serve in round 10 (161 s at sf1, invisible at every gate SF); running
it over the FULL key set is the cheapest way to prove no other key
hides a latent superlinearity.
"""
import json
import sys


def load_bench(path):
    best = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and "queries" in d:
                best = d
    if best is None:
        raise SystemExit(f"no bench JSON line found in {path}")
    return best


def main():
    base = load_bench(sys.argv[1])
    soak = load_bench(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    floor_s = 0.3

    # No silent caps: a key present at only one SF, or one that ERRORED
    # at sf1 (the most superlinear outcome possible — OOM/timeout), must
    # be loud and fail the sweep, not vanish from the join.
    base_keys = set(base["queries"])
    soak_keys = set(soak["queries"])
    missing_in_soak = sorted(base_keys - soak_keys)
    missing_in_base = sorted(soak_keys - base_keys)
    # Gate on SOAK-side errs only (and report the two sides separately):
    # an err baked into the committed base file is a pre-existing,
    # adjudicated condition — failing every future soak on it would make
    # the gate permanently red even when the sf1 run itself is clean.
    # Base errs still print loudly so they can't silently persist.
    base_errs = sorted(set(base.get("errs") or []))
    soak_errs = sorted(set(soak.get("errs") or []))
    hard_fail = bool(missing_in_soak or soak_errs)

    rows = []
    for key, t1 in soak["queries"].items():
        t0 = base["queries"].get(key)
        if t0 is None:
            continue
        if t0 < floor_s and t1 < floor_s:
            continue
        rows.append((t1 / max(t0, 1e-9), t0, t1, key))
    rows.sort(reverse=True)

    print(f"{'ratio':>7} {'sf0.1 s':>8} {'sf1 s':>8}  key")
    flagged = 0
    for i, (ratio, t0, t1, key) in enumerate(rows):
        mark = " <-- SUPERLINEAR" if ratio > threshold else ""
        if ratio > threshold:
            flagged += 1
        if ratio > threshold or i < 25:
            print(f"{ratio:7.1f} {t0:8.2f} {t1:8.2f}  {key}{mark}")
    total0 = sum(t0 for _, t0, _, _ in rows)
    total1 = sum(t1 for _, _, t1, _ in rows)
    print(f"\nkeys compared: {len(rows)} (>= {floor_s}s at either SF); "
          f"total {total0:.1f}s -> {total1:.1f}s "
          f"({total1 / max(total0, 1e-9):.1f}x for 10x data); "
          f"{flagged} key(s) over the {threshold:.0f}x bar")
    if missing_in_soak:
        print(f"MISSING AT SOAK SF ({len(missing_in_soak)} — errored or "
              f"never ran; treat as superlinear until proven otherwise): "
              + ", ".join(missing_in_soak))
    if missing_in_base:
        print(f"missing at base SF ({len(missing_in_base)} — new keys, "
              f"no ratio): " + ", ".join(missing_in_base))
    if soak_errs:
        print(f"BENCH ERRS @soak ({len(soak_errs)} — gate FAILS): "
              + ", ".join(soak_errs))
    if base_errs:
        print(f"bench errs @base ({len(base_errs)} — pre-existing in the "
              f"committed base file, not gated here): " + ", ".join(base_errs))
    if hard_fail:
        raise SystemExit(2)


if __name__ == "__main__":
    main()
