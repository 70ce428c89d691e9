#!/usr/bin/env python3
"""Tests OF the sweep gate (tools/sweep_gate.py) — the round-16 verdict's
"test of the gate script": a deliberately slowed derived BUILD (and a
slowed query) must trip the gate; an in-pin sweep must pass clean.

Runs sweep_gate.py as a subprocess against synthetic fixture files in a
temp dir, with SWEEP_GATE_NO_ISOLATE=1 so no sbt processes launch (the
sweep reading stands as the isolate floor — exactly the confirmation path
a real regression takes after its isolates also read slow).

Stdlib only; invoked by `python3 tools/test_sweep_gate.py` and from sbt
test via graft.SweepGateSpec. Exit 0 = all gate-behavior assertions hold.
"""
import json
import os
import subprocess
import sys
import tempfile

GATE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sweep_gate.py")

BASELINE = {
    "metric": "total",
    "queries": {"q01": 0.4, "q02": 3.0},
    "builds": {"lsh_pairs_b4r2_t0p8": 2.0, "copurchase_pairs_s2": 4.0},
    "sf": "synthetic", "unit": "sec", "value": 3.4,
}


def run_gate(tmp, bench, tag):
    bench_path = os.path.join(tmp, f"bench_{tag}.json")
    base_path = os.path.join(tmp, "baseline.json")
    out_path = os.path.join(tmp, f"out_{tag}.json")
    json.dump(bench, open(bench_path, "w"))
    json.dump(BASELINE, open(base_path, "w"))
    p = subprocess.run(
        [sys.executable, GATE, "99", "synthetic-sf"],
        capture_output=True, text=True, cwd=tmp,
        env={**os.environ,
             "SWEEP_GATE_BENCH": bench_path,
             "SWEEP_GATE_BASELINE": base_path,
             "SWEEP_GATE_OUT": out_path,
             "SWEEP_GATE_NO_ISOLATE": "1"})
    artifact = json.load(open(out_path))
    return p, artifact


def main() -> int:
    failures = []

    def check(cond, msg):
        if not cond:
            failures.append(msg)

    with tempfile.TemporaryDirectory() as tmp:
        # 1. clean sweep: queries and builds inside their pins -> exit 0
        p, art = run_gate(tmp, {
            "queries": {"q01_a": 0.5, "q02_b": 3.2},
            "builds": {"lsh_pairs_b4r2_t0p8": 2.4, "copurchase_pairs_s2": 4.4},
            "build_consumers": {"lsh_pairs_b4r2_t0p8": "q01",
                                "copurchase_pairs_s2": "q02"},
        }, "clean")
        check(p.returncode == 0, f"clean sweep must exit 0, got {p.returncode}: {p.stdout}")
        check(art["confirmed_regressions"] == [], "clean sweep must confirm nothing")
        check(art["builds_sec"]["lsh_pairs_b4r2_t0p8"] == 2.4,
              "build readings must land in the artifact")

        # 2. a deliberately SLOWED BUILD trips the gate (the round-16
        #    verdict's 'done' criterion): 2.0 s pin, 6.0 s sweep -> 3x > 2x
        p, art = run_gate(tmp, {
            "queries": {"q01_a": 0.5, "q02_b": 3.2},
            "builds": {"lsh_pairs_b4r2_t0p8": 6.0, "copurchase_pairs_s2": 4.4},
            "build_consumers": {"lsh_pairs_b4r2_t0p8": "q22",
                                "copurchase_pairs_s2": "q02"},
        }, "slowbuild")
        check(p.returncode == 1, f"slowed build must exit 1, got {p.returncode}: {p.stdout}")
        check(art["confirmed_regressions"] == ["build:lsh_pairs_b4r2_t0p8"],
              f"slowed build must be the confirmed flag, got {art['confirmed_regressions']}")
        check(art["build_flagged"][0]["consumer"] == "q22",
              "the flag must carry the consumer used for isolation")

        # 3. the build floor absorbs single-shot noise: pin 2.0 is under
        #    the 2.5 s floor, so 3.9 s reads 3.9/2.5 = 1.56x -> no flag;
        #    and an UNPINNED build is recorded but never gated
        p, art = run_gate(tmp, {
            "queries": {"q01_a": 0.5},
            "builds": {"lsh_pairs_b4r2_t0p8": 3.9, "brand_new_artifact": 99.0},
            "build_consumers": {"brand_new_artifact": "q05"},
        }, "floor")
        check(p.returncode == 0, f"sub-gate build must pass, got {p.returncode}")
        check(art["build_flagged"] == [], "1.56x floored must not flag")
        check(art["builds_sec"]["brand_new_artifact"] == 99.0,
              "unpinned builds must still be recorded for pinning")

        # 4. a slowed QUERY still trips exactly as before the build gate
        p, art = run_gate(tmp, {
            "queries": {"q01_a": 1.2, "q02_b": 3.2},  # q01: 1.2/0.5floor=2.4x
            "builds": {}, "build_consumers": {},
        }, "slowquery")
        check(p.returncode == 1, f"slowed query must exit 1, got {p.returncode}")
        check(art["confirmed_regressions"] == ["q01_a"],
              f"slowed query must confirm, got {art['confirmed_regressions']}")

    if failures:
        print("GATE-TEST FAILURES:")
        for f in failures:
            print(" -", f)
        return 1
    print("sweep-gate tests: 4 scenarios, all assertions hold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
