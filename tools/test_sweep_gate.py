#!/usr/bin/env python3
"""Tests OF the gate scripts (tools/sweep_gate.py, tools/exponent_gate.py)
— the round-16 verdict's "test of the gate script": a deliberately slowed
derived BUILD (and a slowed query) must trip the sweep gate; an in-pin
sweep must pass clean; and (round-18) a deliberately DE-OPTIMIZED query —
scale exponent jumping past the prior round's row + 0.25 — must trip the
exponent gate even though its absolute sf0.1 seconds would pass the bench.

Runs the gates as subprocesses against synthetic fixture files in a temp
dir, with SWEEP_GATE_NO_ISOLATE=1 so no sbt processes launch (the sweep
reading stands as the isolate floor — exactly the confirmation path a
real regression takes after its isolates also read slow).

Stdlib only; invoked by `python3 tools/test_sweep_gate.py` and from sbt
test via graft.SweepGateSpec. Exit 0 = all gate-behavior assertions hold.
"""
import json
import os
import subprocess
import sys
import tempfile

GATE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sweep_gate.py")
EXP_GATE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "exponent_gate.py")

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

        # 5. a flagged build with NO recorded consumer (triggered outside
        #    any timed query) is UNISOLATABLE: reported, never
        #    auto-confirmed from its single-shot sweep reading. Run in
        #    REAL mode (no SWEEP_GATE_NO_ISOLATE): the consumer-less path
        #    never launches sbt, so the test stays hermetic.
        bench_path = os.path.join(tmp, "bench_noconsumer.json")
        base_path = os.path.join(tmp, "baseline.json")
        out_path = os.path.join(tmp, "out_noconsumer.json")
        json.dump({"queries": {"q01_a": 0.5, "q02_b": 3.2},
                   "builds": {"lsh_pairs_b4r2_t0p8": 9.0},
                   "build_consumers": {}}, open(bench_path, "w"))
        json.dump(BASELINE, open(base_path, "w"))
        env = {k: v for k, v in os.environ.items()
               if k != "SWEEP_GATE_NO_ISOLATE"}
        p = subprocess.run(
            [sys.executable, GATE, "99", "synthetic-sf"],
            capture_output=True, text=True, cwd=tmp,
            env={**env, "SWEEP_GATE_BENCH": bench_path,
                 "SWEEP_GATE_BASELINE": base_path,
                 "SWEEP_GATE_OUT": out_path})
        art = json.load(open(out_path))
        check(p.returncode == 0,
              f"consumer-less build must not auto-confirm, got {p.returncode}")
        check(art["build_flagged"] and art["build_flagged"][0]["unisolatable"],
              "consumer-less flagged build must be reported unisolatable")
        check(art["confirmed_regressions"] == [],
              "unisolatable builds must never land in confirmed_regressions")

        # 6. advisory ratios: every pinned build gets a non-gating
        #    sweep/raw-pin ratio in the artifact (sub-floor drift is
        #    visible before the 2.5 s floor could trip)
        p, art = run_gate(tmp, {
            "queries": {"q01_a": 0.5},
            "builds": {"lsh_pairs_b4r2_t0p8": 4.0},  # 2x raw pin, floored 1.6x
            "build_consumers": {"lsh_pairs_b4r2_t0p8": "q01"},
        }, "advisory")
        check(p.returncode == 0, "sub-floored-gate build must still pass")
        check(art["build_ratios_vs_raw_pin"]["lsh_pairs_b4r2_t0p8"] == 2.0,
              f"advisory raw-pin ratio missing: {art.get('build_ratios_vs_raw_pin')}")

        # ---- exponent gate (round-17 verdict task 8) ----
        def scale_art(q200_100x, extras_cur=None):
            runs = [
                {"multiplier": 10,
                 "queries_sec": {"q200": 1.0, "q298": 0.05,
                                 **({} if not extras_cur else extras_cur[0])},
                 "builds_sec": {"lsh_cands_b4r2": 2.9}},
                {"multiplier": 100,
                 "queries_sec": {"q200": q200_100x, "q298": 0.04,
                                 **({} if not extras_cur else extras_cur[1])},
                 "builds_sec": {"lsh_cands_b4r2": 20.7}},
            ]
            return {"runs": runs}

        def run_exp(cur, prior, tag):
            cur_p = os.path.join(tmp, f"scale_cur_{tag}.json")
            prior_p = os.path.join(tmp, f"scale_prior_{tag}.json")
            out_p = os.path.join(tmp, f"scale_out_{tag}.json")
            json.dump(cur, open(cur_p, "w"))
            json.dump(prior, open(prior_p, "w"))
            p = subprocess.run(
                [sys.executable, EXP_GATE, cur_p, prior_p],
                capture_output=True, text=True,
                env={**os.environ, "EXPONENT_GATE_OUT": out_p})
            return p, json.load(open(out_p))

        prior = scale_art(2.45)  # q200 exponent ~0.39, the r17 row

        # 7. within tolerance: same shape re-measured -> exit 0
        p, art = run_exp(scale_art(2.6), prior, "ok")
        check(p.returncode == 0,
              f"in-tolerance exponents must pass, got {p.returncode}: {p.stdout}")
        check(art["flagged"] == [], f"nothing should flag, got {art['flagged']}")

        # 8. a deliberately de-optimized query (a lost broadcast turning
        #    q200's 0.39 into ~1.1) trips the gate even though 12.6 s at
        #    100x would sail through the absolute-seconds bench gate
        p, art = run_exp(scale_art(12.6), prior, "deopt")
        check(p.returncode == 1,
              f"de-optimized query must trip the exponent gate, got {p.returncode}")
        check(art["flagged"] == ["q200"], f"q200 must flag, got {art['flagged']}")

        # 9. noise floor: q298's 0.04-0.05 s readings carry garbage
        #    exponents by construction and must never gate; new keys are
        #    recorded, not gated
        cur = scale_art(2.6, extras_cur=({"q999": 1.0}, {"q999": 9.9}))
        cur["runs"][1]["queries_sec"]["q298"] = 0.4  # e = log(8)/log(10) = 0.9
        p, art = run_exp(cur, prior, "floor")
        check(p.returncode == 0,
              f"sub-floor + new-key rows must not gate, got {p.returncode}: {p.stdout}")
        statuses = {r["key"]: r["status"] for r in art["rows"]}
        check("not gated" in statuses.get("q298", ""),
              f"q298 must be skipped via the noise floor: {statuses.get('q298')}")
        check("new" in statuses.get("q999", ""),
              f"q999 must be recorded-not-gated: {statuses.get('q999')}")

    if failures:
        print("GATE-TEST FAILURES:")
        for f in failures:
            print(" -", f)
        return 1
    print("sweep-gate + exponent-gate tests: 9 scenarios, all assertions hold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
