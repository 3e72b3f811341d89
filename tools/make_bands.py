#!/usr/bin/env python3
"""Harvest per-row bench noise bands from every committed canonical
bench_full.json (round 15, VERDICT r14 ask #1).

For each headline row, the band is [min, max] of its warm-median reading
across all committed canonical artifacts at the target SF (plus the
working-tree artifact if present). graft.Bench loads the output
(tools/bench_bands.json) and self-adjudicates: a reading above 2x the
band top triggers automatic in-session re-measurement with interleaved
micro-probes, and the evidence rides in the bench artifact.

Usage: python3 tools/make_bands.py [sf0.1]   (run from the repo root)
"""
import json
import subprocess
import sys


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    revs = subprocess.run(
        ["git", "rev-list", "HEAD", "--", "bench_full.json"],
        capture_output=True, text=True, check=True).stdout.split()
    artifacts = []
    for rev in revs:
        try:
            txt = subprocess.run(["git", "show", f"{rev}:bench_full.json"],
                                 capture_output=True, text=True,
                                 check=True).stdout
            artifacts.append(json.loads(txt))
        except (subprocess.CalledProcessError, json.JSONDecodeError):
            continue
    try:
        with open("bench_full.json") as f:
            artifacts.insert(0, json.load(f))
    except (OSError, json.JSONDecodeError):
        pass

    usable = [a for a in artifacts
              if a.get("sf", "").rstrip("/").endswith(sf)
              and isinstance(a.get("calibration_sustained"), (int, float))]
    if not usable:
        sys.exit(f"no canonical artifacts at {sf}")
    # PROBE-HEALTH FILTER: a band harvested from a loaded-host session
    # would legitimize the very anomaly class the bands exist to catch
    # (the unfiltered history put ts_rolling_median's top at 15.4 s — a
    # recorded host spike). Keep only artifacts whose sustained probe is
    # within 1.4x the quietest recorded host phase.
    best = min(a["calibration_sustained"] for a in usable)
    quiet = [a for a in usable if a["calibration_sustained"] <= 1.4 * best]

    values = {}
    for art in quiet:
        for name, v in art.get("queries", {}).items():
            if name.startswith("calibration") or not isinstance(v, (int, float)):
                continue
            if v < 0:  # recorded failure
                continue
            values.setdefault(name, []).append(float(v))

    bands = {}
    for name, vs in values.items():
        vs.sort()
        med = vs[len(vs) // 2]
        # per-row outlier rejection: a transient spike inside an
        # otherwise-quiet session must not stretch the band top
        kept = [v for v in vs if v <= 2.5 * med] or vs
        # band-top cap (round 16, VERDICT r15 ask #2): a history that
        # includes old slow readings (pre-optimization code, loaded
        # sessions that passed the probe filter) would put the top at
        # 2-3x the canonical median, and with the bench's 2x-top trigger
        # a 4-6x host swing would sail through unadjudicated. Cap the
        # top at 1.5x the median so 1.5-2x swings re-measure too.
        bands[name] = (min(kept), min(max(kept), 1.5 * med))

    out = {
        "sf": sf,
        "n_artifacts": len(quiet),
        "probe_best": round(best, 4),
        "bands": {k: [round(lo, 4), round(hi, 4)]
                  for k, (lo, hi) in sorted(bands.items())},
    }
    with open("tools/bench_bands.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote tools/bench_bands.json: {len(bands)} bands from "
          f"{len(quiet)}/{len(usable)} probe-quiet artifacts at {sf}")


if __name__ == "__main__":
    main()
