#!/usr/bin/env python3
"""Write quiet-session warm build minima (`build_warm`) into the
lifecycle entries of tools/bench_reference.json, from a committed
graft.ScratchPhases log (round 19, VERDICT item 2 / ADVICE on
Bench.scala:283).

The primary build gate is 3x+1.5s, sized for the first-of-family JIT
tax; with the untimed store-family warmups absorbing that tax, a real
~2.5x build regression would ship silently. Bench's secondary watch
(1.5x+1.0s, report-only) gates against these quiet-session floors.

Pin policy: build_warm = min over the entry's ScratchPhases builds
EXCLUDING build1 (build1 of the first entry in a session carries the
session's first-of-family tax, and per-entry build1 still pays the
entry's own code-path JIT; builds 2..N are the reproducible warm
floor the watch should compare against).

Usage: python3 tools/warm_pins.py <scratch_phases.log> [--write]
Prints old/new per entry; --write updates tools/bench_reference.json
in place (entries absent from the log keep whatever build_warm they
had).
"""
import json
import re
import sys

REF = "tools/bench_reference.json"


def main():
    src = sys.argv[1]
    write = "--write" in sys.argv
    builds = {}
    pat = re.compile(r"\[phases\] (\S+) build(\d+) ([0-9.]+) s")
    for line in open(src):
        m = pat.search(line)
        if m:
            builds.setdefault(m.group(1), {})[int(m.group(2))] = \
                float(m.group(3))
    if not builds:
        sys.exit("no '[phases] <name> buildN' lines in " + src)
    # Probe floors (r19 VERDICT item 6a): ScratchPhases prints
    # '[phases] <name> probeN <s> s' after the builds; record
    # probe_warm = min over probes 2..N (probe1 pays the fresh store's
    # page-cache/codegen fill) next to build_warm. Recorded for
    # density diagnostics; the probe GATE stays the 2x+0.75s min-over-
    # passes wall.
    probes = {}
    ppat = re.compile(r"\[phases\] (\S+) probe(\d+) ([0-9.]+) s")
    for line in open(src):
        m = ppat.search(line)
        if m:
            probes.setdefault(m.group(1), {})[int(m.group(2))] = \
                float(m.group(3))
    ref = json.load(open(REF))
    # Same sf guard as total_floors.py (ADVICE r19 6b: the repin tool's
    # sf guard did not cover floors).
    import total_floors
    total_floors.check_log_sf(src, ref, r"\[phases\] sf (\S+)")
    print(f"{'query':42s} {'n':>2s} {'warm_min':>8s} {'old':>8s} {'probe_w':>8s}")
    for name in sorted(builds):
        runs = builds[name]
        warm = [s for i, s in runs.items() if i > 1]
        if not warm:
            print(f"{name:42s} SKIP (only build1 in log)")
            continue
        pin = round(min(warm), 2)
        entry = ref["queries"].get(name)
        if not isinstance(entry, dict):
            print(f"{name:42s} SKIP (not a lifecycle {{build,probe}} entry)")
            continue
        pwarm = [s for i, s in probes.get(name, {}).items() if i > 1]
        ppin = round(min(pwarm), 2) if pwarm else None
        old = entry.get("build_warm")
        old_s = f"{old:8.2f}" if isinstance(old, (int, float)) else f"{'-':>8s}"
        pp_s = f"{ppin:8.2f}" if ppin is not None else f"{'-':>8s}"
        print(f"{name:42s} {len(runs):2d} {pin:8.2f} {old_s} {pp_s}")
        if write:
            entry["build_warm"] = pin
            if ppin is not None:
                entry["probe_warm"] = ppin
    if write:
        json.dump(ref, open(REF, "w"), indent=1, sort_keys=False)
        print("wrote", REF, "- note the log file + session conditions "
              "in the note field")


if __name__ == "__main__":
    main()
