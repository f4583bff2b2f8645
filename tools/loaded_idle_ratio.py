#!/usr/bin/env python3
"""Per-query loaded/idle wall ratios across rounds.

The driver's round-end commit ("round N: verdict/...") carries the
bench_full.json of ITS loaded run; the commit right before it carries the
round's committed idle bench. The ratio loaded/idle per query, tracked
across rounds, separates engine-side regressions (the SAME queries spike
every round) from machine-side contention (a different random subset
spikes each round).

Writes loaded_idle_ratio.json next to the repo root and prints a
markdown table of repeat offenders for SCALE.md.

Usage: python3 tools/loaded_idle_ratio.py [--threshold 3.0]
"""
import json
import re
import subprocess
import sys


def sh(*args):
    return subprocess.run(args, capture_output=True, text=True).stdout


def bench_at(commit):
    txt = sh("git", "show", f"{commit}:bench_full.json")
    if not txt.strip():
        return None, None, None
    try:
        d = json.loads(txt)
        m = d.get("metrics")
        if m:
            return ({k: v["time"] for k, v in m.items() if v["time"] > 0},
                    m, d.get("job_latency_sec") or 0.05)
        return {k: v for k, v in d.get("queries", {}).items() if v > 0}, None, None
    except (json.JSONDecodeError, KeyError, TypeError):
        return None, None, None


def bound(t, exec_run_ms, gc_ms, jobs, job_latency_sec, cores=32):
    """Mirror of graft.BenchGates.bound — machine-classifies a wall time
    from its telemetry (scheduler|gc|exec|idle-consistent). The run's
    own per-job latency is part of the expected wall: every small query
    pays it, and ignoring it mass-classifies an idle catalog as
    scheduler-bound."""
    if t <= 0:
        return "idle-consistent"
    exec_sec = exec_run_ms / 1000.0 / cores
    gc_sec = gc_ms / 1000.0 / cores
    expected = exec_sec + gc_sec + jobs * job_latency_sec + 0.2
    if exec_sec >= 0.4 * t:
        return "exec"
    if gc_sec >= 0.25 * t:
        return "gc"
    if t > 2 * expected and jobs >= 3:
        return "scheduler"
    return "idle-consistent"


def main():
    threshold = 3.0
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
    log = sh("git", "log", "--format=%H %s")
    rounds = []  # (round, driver_commit, idle_commit)
    for line in log.splitlines():
        m = re.match(r"(\w+) round (\d+): verdict", line)
        if m:
            rounds.append((int(m.group(2)), m.group(1)))
    rounds.sort()
    out = {}
    spike_sets = {}
    bounds = {}
    for rnd, commit in rounds:
        loaded, lmet, ljl = bench_at(commit)
        idle, _, _ = bench_at(f"{commit}~1")
        if not loaded or not idle:
            continue
        ratios = {}
        for q, tl in loaded.items():
            ti = idle.get(q)
            if ti and ti > 0.05:  # sub-50ms idle queries are all jitter
                ratios[q] = round(tl / ti, 2)
        out[f"r{rnd}"] = ratios
        spike_sets[rnd] = {q for q, r in ratios.items() if r >= threshold}
        # telemetry exists from r11 on: classify every spike so the
        # artifact carries the machine-vs-engine verdict itself
        if lmet and all(k in next(iter(lmet.values()), {})
                        for k in ("exec_run_ms", "gc_ms", "jobs")):
            bounds[rnd] = {
                q: bound(lmet[q]["time"], lmet[q]["exec_run_ms"],
                         lmet[q]["gc_ms"], lmet[q]["jobs"], ljl)
                for q in spike_sets[rnd] if q in lmet}
            out[f"r{rnd}_bounds"] = bounds[rnd]
    with open("loaded_idle_ratio.json", "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print(f"wrote loaded_idle_ratio.json ({len(out)} rounds)")
    if not spike_sets:
        return
    print(f"\n## Loaded/idle spikes (ratio >= {threshold}) per round\n")
    print("| round | n spiked | spiked queries (top 8 by ratio) |")
    print("|---|---|---|")
    for rnd in sorted(spike_sets):
        qs = sorted(spike_sets[rnd],
                    key=lambda q: -out[f"r{rnd}"][q])[:8]
        cells = ", ".join(
            f"{q} ({out[f'r{rnd}'][q]}x"
            + (f", {bounds[rnd][q]}" if rnd in bounds and q in bounds[rnd]
               else "") + ")"
            for q in qs)
        print(f"| r{rnd} | {len(spike_sets[rnd])} | {cells} |")
    all_rounds = sorted(spike_sets)
    if len(all_rounds) >= 2:
        last, prev = spike_sets[all_rounds[-1]], spike_sets[all_rounds[-2]]
        inter = last & prev
        print(f"\nrepeat offenders r{all_rounds[-2]} ∩ r{all_rounds[-1]}: "
              f"{sorted(inter) if inter else 'NONE (machine-side pattern)'}")


if __name__ == "__main__":
    main()
