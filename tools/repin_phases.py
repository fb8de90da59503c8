#!/usr/bin/env python3
"""Convert the standing-store lifecycle entries of
tools/bench_reference.json to per-phase {build, probe} pins from a
fresh bench_out.json (round 18, VERDICT item 2).

Pin policy:
  build = the session's lifecycle_builds reading (the same dense-session
          measurement context the driver's round-close bench uses;
          Bench gates builds at 3x + 1.5s, sized for the measured 2.8x
          first-of-family JIT tax on identical code).
  probe = min over the session's timed probe passes (steady-state
          serving cost; gated at 2x + 0.75s, unchanged).

Usage: python3 tools/repin_phases.py <bench_out.json> [--write]
Prints the old total pin vs the new per-phase pin for every lifecycle
query; --write updates tools/bench_reference.json in place (queries not
in lifecycle_builds keep their total pins untouched).
"""
import json
import sys

REF = "tools/bench_reference.json"


def main():
    src = sys.argv[1]
    write = "--write" in sys.argv
    bo = json.load(open(src))
    ref = json.load(open(REF))
    # A bench_out measured at the wrong scale factor would silently write
    # wrong-scale pins (Bench only validates sf at gate time, against the
    # unchanged ref sf) — refuse scale mismatches up front.
    import os
    bo_sf = os.path.basename(str(bo.get("sf", "")).rstrip("/"))
    ref_sf = os.path.basename(str(ref.get("sf", "")).rstrip("/"))
    if bo_sf != ref_sf:
        sys.exit(f"sf mismatch: bench_out sf={bo_sf!r} vs reference sf="
                 f"{ref_sf!r} — refusing to (re)pin from a wrong-scale run")
    builds = bo.get("lifecycle_builds", {})
    passes = bo.get("passes", {})
    if not builds:
        sys.exit("no lifecycle_builds in " + src)
    print(f"{'query':42s} {'old_total':>9s} {'build':>7s} {'probe':>7s}")
    for name in sorted(builds):
        runs = [p["sec"] for p in passes.get(name, []) if p]
        if not runs:
            print(f"{name:42s} SKIP (no probe passes)")
            continue
        pin = {"build": round(builds[name], 2), "probe": round(min(runs), 2)}
        old = ref["queries"].get(name)
        old_s = f"{old:9.2f}" if isinstance(old, (int, float)) else f"{'-':>9s}"
        print(f"{name:42s} {old_s} {pin['build']:7.2f} {pin['probe']:7.2f}")
        if write:
            ref["queries"][name] = pin
    if write:
        json.dump(ref, open(REF, "w"), indent=1, sort_keys=False)
        print("wrote", REF, "- update the note field with the justification")


if __name__ == "__main__":
    main()
