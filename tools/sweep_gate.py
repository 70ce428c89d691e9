#!/usr/bin/env python3
"""Sweep gate: floored 2x ratios + in-sweep isolate protocol.

Reads BENCH_FULL.json (written by the graft.Bench run that tools/sweep.sh
just finished) and BASELINE_QUERIES.json, applies the round-15 gate
definition from BASELINE.md — ratio = t / max(pin, 0.5 s) — and for any
query still over 2x runs the 3-isolate protocol (SPARK_GRAFT_ONLY=<q> x 3,
elementwise min) INSIDE the sweep, recording the isolates in the artifact.
A flag is CONFIRMED only if the isolate floor also exceeds 2x floored.

Writes BENCH_LOCAL_r{round}.json. Exit code 1 iff any flag is confirmed.
"""
import json
import re
import subprocess
import sys

FLOOR_SEC = 0.5
GATE = 2.0
ISOLATE_REPS = 3


def short(name: str) -> str:
    return name.split("_")[0]


def run_isolates(query_full: str, sf: str) -> list[float]:
    """Three isolated Bench runs of one query; returns the readings."""
    out = []
    for _ in range(ISOLATE_REPS):
        p = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            capture_output=True, text=True,
            env={**__import__("os").environ,
                 "SPARK_GRAFT_ONLY": short(query_full),
                 "SPARK_GRAFT_SF_DIR": sf,
                 # do not clobber the sweep's BENCH_FULL.json
                 "SPARK_GRAFT_BENCH_OUT": "/tmp/bench_isolate.json"},
        )
        # Bench's JSON line keys queries by SHORT name ("q256": 1.48) —
        # matching the full name here returned zero isolates and let a
        # flag "confirm" with no isolate evidence (round-15 q256)
        m = re.search(r'"%s":([0-9.]+)' % re.escape(short(query_full)),
                      p.stdout + p.stderr)
        if m:
            out.append(float(m.group(1)))
    return out


def main() -> int:
    rnd = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    full = json.load(open("BENCH_FULL.json"))
    pins = json.load(open("BASELINE_QUERIES.json"))["queries"]
    qsec = full["queries"]

    flagged = []
    for name, t in sorted(qsec.items()):
        pin = pins.get(short(name))
        if pin is None:
            continue
        denom = max(pin, FLOOR_SEC)
        if t / denom > GATE:
            iso = run_isolates(name, sf)
            floor = min(iso) if iso else t
            flagged.append({
                "query": name, "sweep_sec": t, "pin_sec": pin,
                "floored_denom_sec": denom,
                "sweep_ratio_floored": round(t / denom, 2),
                "isolates_sec": iso,
                "isolate_floor_ratio_floored": round(floor / denom, 2),
                "confirmed": floor / denom > GATE,
            })

    pin_sum = round(sum(pins.values()), 3)
    total = round(sum(qsec.values()), 3)
    artifact = {
        "round": int(rnd),
        "sf": sf,
        "method": ("tools/sweep.sh: graft.Bench full sweep (internal "
                   "best-of-reps per query), quiet box; gate = sweep_sec / "
                   "max(pin, 0.5 s) <= 2x per BASELINE.md round-15 gate "
                   "definition; >2x readings auto-isolated in-sweep "
                   f"({ISOLATE_REPS} runs, elementwise min), flag confirmed "
                   "only if the isolate floor also exceeds 2x floored."),
        "n_queries": len(qsec),
        "total_sec": total,
        "pin_sum_sec": pin_sum,
        "ratio_vs_pin_sum": round(total / pin_sum, 3),
        "flagged": flagged,
        "confirmed_regressions": [f["query"] for f in flagged if f["confirmed"]],
        "queries_sec": {k: qsec[k] for k in sorted(qsec)},
    }
    out = f"BENCH_LOCAL_r{rnd}.json"
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"wrote {out}: {len(qsec)} queries, total {total} s = "
          f"{artifact['ratio_vs_pin_sum']}x pin-sum, "
          f"{len(flagged)} flagged, "
          f"{len(artifact['confirmed_regressions'])} confirmed")
    for f in flagged:
        print("  FLAG", f["query"], f["sweep_sec"], "vs pin", f["pin_sec"],
              "isolates", f["isolates_sec"],
              "CONFIRMED" if f["confirmed"] else "box-state (cleared)")
    return 1 if artifact["confirmed_regressions"] else 0


if __name__ == "__main__":
    sys.exit(main())
