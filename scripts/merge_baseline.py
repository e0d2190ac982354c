#!/usr/bin/env python3
"""Merge bench runs into BENCH_baseline.json (per-row min-of-runs).

Usage: python3 scripts/merge_baseline.py RUN1.json [RUN2.json ...]

Reads each run's {"queries": {...}, "scale": {"queries": {...}}} rows,
takes the per-row MINIMUM across the given runs and the existing
baseline, and rewrites BENCH_baseline.json as
{"standard": {...}, "scale": {...}}.

Rows with an adjudicated ISOLATED FLOOR (contexts that measure warm
in-sequence but slower fresh — see Bench.isolatedFloorSec) are never
merged below their floor: a warm number sneaking into the committed
file is exactly the gate-weakening drift the floor exists to stop.
Any run value under a floor is flagged and clamped.
"""
import json
import sys

# keep in sync with Bench.isolatedFloorSec
ISOLATED_FLOOR = {"st1_streaming_ingest": 9.3}  # r15 re-adjudication (atomic chunk drops; isolated fresh 9.37 s)

BASELINE = "BENCH_baseline.json"


def rows(path):
    with open(path) as f:
        d = json.load(f)
    if "standard" in d:  # baseline-shaped
        return d.get("standard", {}), d.get("scale", {})
    return d.get("queries", {}), d.get("scale", {}).get("queries", {})


def merge(dst, src, section, reset=()):
    for k, v in src.items():
        if v >= 1e9:  # failed row: never merge a sentinel
            print(f"  skip {section}/{k}: failed-run sentinel")
            continue
        floor = ISOLATED_FLOOR.get(k)
        if floor is not None and v < floor:
            print(f"  clamp {section}/{k}: {v:.2f}s < isolated floor "
                  f"{floor:.2f}s (warm-context run — floor kept)")
            v = floor
        if k in reset:
            # --reset rows take the RUN value outright: a deliberately
            # changed workload (e.g. a bench arm re-configured to do
            # more work) must not stay pinned to the old plan's min
            print(f"  reset {section}/{k}: {dst.get(k)} -> {v:.2f}s")
            dst[k] = v
            continue
        prev = dst.get(k)
        if prev is not None and floor is not None and prev < floor:
            # repair a drifted COMMITTED row too: an existing value
            # below the floor got merged before the floor existed (or
            # past a bug) — min() against it would keep the drift
            # forever, with only Bench's runtime override masking it
            print(f"  repair {section}/{k}: committed {prev:.2f}s < "
                  f"floor {floor:.2f}s — clamped before min")
            prev = floor
        dst[k] = v if prev is None else min(prev, v)


def main(argv):
    reset = set()
    args = []
    for a in argv:
        if a.startswith("--reset="):
            reset.update(x for x in a[len("--reset="):].split(",") if x)
        else:
            args.append(a)
    argv = args
    if not argv:
        print(__doc__)
        return 2
    try:
        std, scale = rows(BASELINE)
        print(f"existing baseline: {len(std)} standard / {len(scale)} scale")
    except FileNotFoundError:
        std, scale = {}, {}
        print("no existing baseline — starting fresh")
    for p in argv:
        s, sc = rows(p)
        print(f"merging {p}: {len(s)} standard / {len(sc)} scale")
        merge(std, s, "standard", reset)
        merge(scale, sc, "scale", reset)
    with open(BASELINE, "w") as f:
        json.dump({"standard": std, "scale": scale}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
    print(f"wrote {BASELINE}: {len(std)} standard / {len(scale)} scale")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
