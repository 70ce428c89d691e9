#!/usr/bin/env python3
"""Scale-exponent gate: a regression detector for DESIGN-FOR-SCALE, not
wall time (round-17 verdict task 8).

SCALE_r{N}.json records, per measured query and derived build, the fitted
scale exponent (t ~ data^e, e = log(t_hi/t_lo)/log(mult_hi/mult_lo)).
Those exponents are the repo's 100 TB evidence — but until this gate,
nothing TRIPPED if one regressed: a broadcast lost to a plan change can
turn q200's 0.39 into 1.2 while the sf0.1 bench still passes, because at
sf0.1 the absolute seconds barely move. This script compares a freshly
measured SCALE artifact against the prior round's and exits 1 when any
shared query/build exponent grew by more than TOLERANCE.

    python3 tools/exponent_gate.py SCALE_r18.json SCALE_r17.json

Rules:
  - exponents are RECOMPUTED from the runs[] readings when present
    (min/max multiplier with a reading for that key), so a hand-edited
    summary table cannot defang the gate; the declared
    consumer_exponents/build_exponents maps are the fallback.
  - tolerance +0.25 (box noise on 2-rep minima moves small exponents by
    ~0.1-0.2; a real complexity-class change moves them by >=0.5).
  - readings whose LARGEST-multiplier time is under NOISE_FLOOR_SEC are
    skipped: the exponent of a 0.05 s reading is timer noise, and gating
    it would manufacture flakes exactly where the design is best.
  - keys present only in the current artifact are recorded, never gated
    (new queries have no prior row to regress from).

Env overrides for the self-test (tools/test_sweep_gate.py):
EXPONENT_GATE_OUT (artifact path; default none — stdout only).
"""
import json
import math
import os
import sys

TOLERANCE = 0.25
NOISE_FLOOR_SEC = 0.5


def _fit(runs: list, section: str, key: str):
    """Exponent from the smallest/largest multiplier carrying a reading,
    plus the largest-multiplier reading itself (for the noise floor)."""
    pts = [(r["multiplier"], r.get(section, {}).get(key))
           for r in runs]
    pts = [(m, t) for m, t in pts if t is not None and t > 0]
    if len(pts) < 2:
        return None, None
    (m_lo, t_lo), (m_hi, t_hi) = min(pts), max(pts)
    if m_lo == m_hi:
        return None, None
    return (math.log(t_hi / t_lo) / math.log(m_hi / m_lo), t_hi)


def exponents(artifact: dict, section: str, declared_key: str) -> dict:
    """{key: (exponent, t_at_max_mult_or_None)} — recomputed where runs
    carry readings, declared map as fallback."""
    out = {}
    declared = artifact.get(declared_key, {}) or {}
    runs = artifact.get("runs", []) or []
    keys = set(declared)
    for r in runs:
        keys |= set(r.get(section, {}))
    for k in sorted(keys):
        e, t_hi = _fit(runs, section, k)
        if e is None and k in declared:
            e, t_hi = float(declared[k]), None
        if e is not None:
            out[k] = (round(e, 3), t_hi)
    return out


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    cur = json.load(open(sys.argv[1]))
    prior = json.load(open(sys.argv[2]))
    sections = [("queries_sec", "consumer_exponents", "query"),
                ("builds_sec", "build_exponents", "build")]
    flagged, rows = [], []
    for section, declared_key, label in sections:
        cur_e = exponents(cur, section, declared_key)
        prior_e = exponents(prior, section, declared_key)
        for k, (e, t_hi) in sorted(cur_e.items()):
            pe = prior_e.get(k)
            row = {"kind": label, "key": k, "exponent": e,
                   "prior_exponent": pe[0] if pe else None,
                   "t_at_max_mult_sec": t_hi}
            if pe is None:
                row["status"] = "new (recorded, not gated)"
            elif t_hi is not None and t_hi < NOISE_FLOOR_SEC:
                row["status"] = f"sub-floor ({t_hi} s at max mult; not gated)"
            elif e > pe[0] + TOLERANCE:
                row["status"] = "REGRESSED"
                flagged.append(row)
            else:
                row["status"] = "ok"
            rows.append(row)
    artifact = {"tolerance": TOLERANCE, "noise_floor_sec": NOISE_FLOOR_SEC,
                "current": sys.argv[1], "prior": sys.argv[2],
                "rows": rows,
                "flagged": [r["key"] for r in flagged]}
    out = os.environ.get("EXPONENT_GATE_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(artifact, fh, indent=1)
    for r in rows:
        mark = "FLAG " if r["status"] == "REGRESSED" else "     "
        print(f"{mark}{r['kind']:5s} {r['key']:32s} "
              f"e={r['exponent']:+.2f} prior="
              f"{'-' if r['prior_exponent'] is None else format(r['prior_exponent'], '+.2f')} "
              f"[{r['status']}]")
    print(f"exponent gate: {len(rows)} rows, {len(flagged)} regressed "
          f"(tolerance +{TOLERANCE}, noise floor {NOISE_FLOOR_SEC} s)")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
