#!/usr/bin/env python3
"""Sweep gate: floored 2x ratios + in-sweep isolate protocol.

Reads BENCH_FULL.json (written by the graft.Bench run that tools/sweep.sh
just finished) and BASELINE_QUERIES.json, applies the round-15 gate
definition from BASELINE.md — ratio = t / max(pin, 0.5 s) — and for any
query still over 2x runs the 3-isolate protocol (SPARK_GRAFT_ONLY=<q> x 3,
elementwise min) INSIDE the sweep, recording the isolates in the artifact.
A flag is CONFIRMED only if the isolate floor also exceeds 2x floored.

Round 17 adds the DERIVED BUILD gate: Bench clears the derived store at
startup, so every shared artifact (pair mining, LSH pairs, Lloyd, ...)
rebuilds once per sweep and its wall time lands in BENCH_FULL.json's
"builds" section. Those are gated against BASELINE_QUERIES.json's "builds"
pins the same floored-2x way (floor 2.5 s: builds are SINGLE-SHOT readings
— no best-of-3 to shed janino/JIT — and a fresh JVM's first Lloyd/mining
build pays ~3 s of one-time codegen that would otherwise "confirm" as a
false regression in the fresh-JVM isolate runs). This closes the round-16 hole where consumer pins
priced the artifact SCAN while a 2x regression in the build chains shipped
invisibly. A flagged build is isolated by re-running its recorded consumer
query (Bench re-clears the store, so the build re-runs) 3x, taking the min.

Env overrides (used by tools/test_sweep_gate.py so the gate itself is
testable): SWEEP_GATE_BENCH, SWEEP_GATE_BASELINE, SWEEP_GATE_OUT,
SWEEP_GATE_NO_ISOLATE=1 (skip the sbt isolate runs; the sweep reading
stands as the isolate floor).

Writes BENCH_LOCAL_r{round}.json. Exit code 1 iff any flag is confirmed.
"""
import json
import os
import re
import subprocess
import sys

FLOOR_SEC = 0.5
BUILD_FLOOR_SEC = 2.5
GATE = 2.0
ISOLATE_REPS = 3


def short(name: str) -> str:
    return name.split("_")[0]


def no_isolate() -> bool:
    return os.environ.get("SWEEP_GATE_NO_ISOLATE") == "1"


def bench_env(only: str, sf: str) -> dict:
    return {**os.environ,
            "SPARK_GRAFT_ONLY": only,
            "SPARK_GRAFT_SF_DIR": sf,
            # do not clobber the sweep's BENCH_FULL.json
            "SPARK_GRAFT_BENCH_OUT": "/tmp/bench_isolate.json"}


def run_isolates(query_full: str, sf: str) -> list[float]:
    """Three isolated Bench runs of one query; returns the readings."""
    if no_isolate():
        return []
    out = []
    for _ in range(ISOLATE_REPS):
        p = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            capture_output=True, text=True,
            env=bench_env(short(query_full), sf),
        )
        # Bench's JSON line keys queries by SHORT name ("q256": 1.48) —
        # matching the full name here returned zero isolates and let a
        # flag "confirm" with no isolate evidence (round-15 q256)
        m = re.search(r'"%s":([0-9.]+)' % re.escape(short(query_full)),
                      p.stdout + p.stderr)
        if m:
            out.append(float(m.group(1)))
    return out


def run_build_isolates(build: str, consumer_short: str, sf: str) -> list[float]:
    """Three isolated re-builds of one derived artifact: Bench clears the
    derived store at startup, so running the artifact's consumer re-pays
    the build; the reading comes from the isolate's own builds map."""
    if no_isolate():
        return []
    out = []
    for _ in range(ISOLATE_REPS):
        # a crashed sbt run must yield NO reading for this rep, not a
        # silent re-read of the previous rep's (or a prior isolate's)
        # leftover file masquerading as fresh evidence
        try:
            os.remove("/tmp/bench_isolate.json")
        except OSError:
            pass
        subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            capture_output=True, text=True,
            env=bench_env(consumer_short, sf),
        )
        try:
            iso = json.load(open("/tmp/bench_isolate.json"))
            t = iso.get("builds", {}).get(build)
            if t is not None:
                out.append(float(t))
        except (OSError, ValueError):
            pass
    return out


def main() -> int:
    rnd = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    full = json.load(open(os.environ.get("SWEEP_GATE_BENCH", "BENCH_FULL.json")))
    baseline = json.load(open(
        os.environ.get("SWEEP_GATE_BASELINE", "BASELINE_QUERIES.json")))
    pins = baseline["queries"]
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

    # ---- derived-build gate ----
    builds = full.get("builds", {})
    build_consumers = full.get("build_consumers", {})
    build_pins = baseline.get("builds", {})
    build_flagged = []
    # advisory (non-gating) ratio vs the RAW pin for every pinned build:
    # the 2.5 s floor means a sub-second build can regress ~5x before the
    # gate trips, so drift must be VISIBLE in the artifact before it ever
    # crosses the floored gate
    build_ratios_raw = {
        name: round(t / build_pins[name], 2)
        for name, t in sorted(builds.items()) if build_pins.get(name)
    }
    for name, t in sorted(builds.items()):
        pin = build_pins.get(name)
        if pin is None:
            continue  # unpinned build: recorded, not gated (pin it next)
        denom = max(pin, BUILD_FLOOR_SEC)
        if t / denom > GATE:
            consumer = build_consumers.get(name, "")
            # a build with no recorded consumer (triggered outside any
            # timed query) CANNOT be isolated — report it as such instead
            # of auto-confirming its single-shot sweep reading
            iso = run_build_isolates(name, consumer, sf) if consumer else []
            floor = min(iso) if iso else t
            unisolatable = not consumer and not no_isolate()
            build_flagged.append({
                "build": name, "sweep_sec": t, "pin_sec": pin,
                "consumer": consumer,
                "floored_denom_sec": denom,
                "sweep_ratio_floored": round(t / denom, 2),
                "isolates_sec": iso,
                "isolate_floor_ratio_floored": round(floor / denom, 2),
                "unisolatable": unisolatable,
                "confirmed": (not unisolatable) and floor / denom > GATE,
            })

    pin_sum = round(sum(pins.values()), 3)
    total = round(sum(qsec.values()), 3)
    confirmed = ([f["query"] for f in flagged if f["confirmed"]] +
                 ["build:" + f["build"] for f in build_flagged if f["confirmed"]])
    artifact = {
        "round": int(rnd),
        "sf": sf,
        "method": ("tools/sweep.sh: graft.Bench full sweep (internal "
                   "best-of-reps per query), quiet box; gate = sweep_sec / "
                   "max(pin, 0.5 s) <= 2x per BASELINE.md round-15 gate "
                   "definition; >2x readings auto-isolated in-sweep "
                   f"({ISOLATE_REPS} runs, elementwise min), flag confirmed "
                   "only if the isolate floor also exceeds 2x floored. "
                   "Derived-artifact BUILD wall times (Bench clears the "
                   "store at startup, so each build runs once per sweep) "
                   "are gated the same way against the baseline's 'builds' "
                   f"pins, floored at {BUILD_FLOOR_SEC} s (single-shot readings "
                   "carry one-time JIT), isolated by "
                   "re-running the recorded consumer."),
        "n_queries": len(qsec),
        "total_sec": total,
        "pin_sum_sec": pin_sum,
        "ratio_vs_pin_sum": round(total / pin_sum, 3),
        "flagged": flagged,
        "builds_sec": {k: builds[k] for k in sorted(builds)},
        "build_consumers": {k: build_consumers[k] for k in sorted(build_consumers)},
        # ADVISORY, never gating: sweep/raw-pin ratio per pinned build, so
        # sub-floor drift (a 0.86 s build sliding toward the 2.5 s floor)
        # is visible rounds before the floored gate could trip
        "build_ratios_vs_raw_pin": build_ratios_raw,
        "build_flagged": build_flagged,
        "confirmed_regressions": confirmed,
        "queries_sec": {k: qsec[k] for k in sorted(qsec)},
    }
    out = os.environ.get("SWEEP_GATE_OUT", f"BENCH_LOCAL_r{rnd}.json")
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"wrote {out}: {len(qsec)} queries, total {total} s = "
          f"{artifact['ratio_vs_pin_sum']}x pin-sum, "
          f"{len(builds)} builds, "
          f"{len(flagged)}+{len(build_flagged)} flagged, "
          f"{len(confirmed)} confirmed")
    for f in flagged:
        print("  FLAG", f["query"], f["sweep_sec"], "vs pin", f["pin_sec"],
              "isolates", f["isolates_sec"],
              "CONFIRMED" if f["confirmed"] else "box-state (cleared)")
    for f in build_flagged:
        print("  FLAG build:" + f["build"], f["sweep_sec"], "vs pin",
              f["pin_sec"], "isolates", f["isolates_sec"],
              "CONFIRMED" if f["confirmed"]
              else ("UNISOLATABLE (no recorded consumer; not auto-confirmed)"
                    if f.get("unisolatable") else "box-state (cleared)"))
    for name, r in sorted(build_ratios_raw.items(), key=lambda kv: -kv[1]):
        if r > 1.5:
            print(f"  advisory build drift {name}: {r}x raw pin "
                  f"({builds[name]} s vs {build_pins[name]} s; non-gating)")
    return 1 if confirmed else 0


if __name__ == "__main__":
    sys.exit(main())
