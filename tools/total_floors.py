#!/usr/bin/env python3
"""Write quiet-session total floors (`total_warm`) into non-lifecycle
entries of tools/bench_reference.json, from a committed graft.Scratch
log (round 20, VERDICT item 3: end the total-pin ratchet the way
build_warm ended it for lifecycle builds).

Floor = the `warm_min` of the `[scratch] <name> TOTAL min X warm_min Y
max Z` line (min over runs 2..N of a quiet Scratch session under the
same engine config Bench runs — run 1 pays the query's own code-path
JIT).

Pin policy (--anchor): the gate anchor `total` is set to
min(old pin, floor) — a pin is LOWERED to the quiet floor where the
old pin priced session drift (the r19 ratchet rows), and never raised
by this tool (a quiet Scratch session is COLDER than a 268-query bench
for small queries — shared-operator JIT makes bench readings beat the
5-run floor on ~40% of rows — so floor-above-pin means the floor is
conservative, not that the pin was lucky). Session-density drift is
then visible data (Bench's TOTAL-WARM WATCH, report-only) instead of
a reason to ratchet the pin. An upward total re-pin without a fresh
floor reading in the log is a policy violation.

Usage: python3 tools/total_floors.py <scratch.log> [--write] [--anchor]
  --write   add/update "total_warm" (keeps the existing pin)
  --anchor  also set "total" := floor (floor-anchored gate)
Entries absent from the log are untouched; lifecycle {build,probe}
entries are refused (use warm_pins.py).
"""
import json
import re
import sys

REF = "tools/bench_reference.json"


def check_log_sf(src, ref, pat):
    """Refuse a floor log measured at a different scale factor than the
    reference (ADVICE r19 6b: the repin tool's sf guard did not cover
    floors). Logs from before the '[scratch|phases] sf' disclosure line
    get a warning instead of a refusal."""
    import os
    import re as _re
    sfs = [m.group(1) for line in open(src)
           for m in [_re.search(pat, line)] if m]
    ref_sf = os.path.basename(str(ref.get("sf", "")).rstrip("/"))
    if not sfs:
        print(f"WARNING: {src} has no sf disclosure line (pre-r20 log) - "
              f"confirm it was measured at {ref_sf!r} before trusting it")
        return
    log_sf = os.path.basename(sfs[0].rstrip("/"))
    if log_sf != ref_sf:
        sys.exit(f"sf mismatch: log sf={log_sf!r} vs reference sf="
                 f"{ref_sf!r} - refusing to write wrong-scale floors")


def main():
    src = sys.argv[1]
    write = "--write" in sys.argv
    anchor = "--anchor" in sys.argv
    floors = {}
    pat = re.compile(
        r"\[scratch\] (\S+) TOTAL min ([0-9.]+) warm_min ([0-9.]+) max ([0-9.]+)")
    for line in open(src):
        m = pat.search(line)
        if m:
            floors[m.group(1)] = float(m.group(3))
    if not floors:
        sys.exit("no '[scratch] <name> TOTAL' lines in " + src)
    ref = json.load(open(REF))
    check_log_sf(src, ref, r"\[scratch\] sf (\S+)")
    print(f"{'query':42s} {'floor':>7s} {'old_pin':>8s} {'new_pin':>8s}")
    for name in sorted(floors):
        floor = round(floors[name], 2)
        entry = ref["queries"].get(name)
        if entry is None:
            print(f"{name:42s} SKIP (not in reference)")
            continue
        if isinstance(entry, dict) and "build" in entry:
            print(f"{name:42s} SKIP (lifecycle entry; use warm_pins.py)")
            continue
        old = entry["total"] if isinstance(entry, dict) else entry
        new = min(old, floor) if anchor else old
        print(f"{name:42s} {floor:7.2f} {old:8.2f} {new:8.2f}")
        if write:
            ref["queries"][name] = {"total": new, "total_warm": floor}
    if write:
        json.dump(ref, open(REF, "w"), indent=1, sort_keys=False)
        print("wrote", REF, "- note the log file + session conditions "
              "in the note field")


if __name__ == "__main__":
    main()
