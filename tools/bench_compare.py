#!/usr/bin/env python3
"""Phase-normalized round-over-round bench comparison (round-8 verdict
ask #3; per-row probe selection round 12 — VERDICT r11 ask #2: the
r10->r11 shuffle-path phase shift was adjudicated narratively twice;
this makes it mechanical).

Usage: python3 tools/bench_compare.py <BENCH_a.json> <BENCH_b.json> [out.md]

Accepts either the driver's BENCH_r{N}.json wrapper (the bench line is
embedded in its "tail") or a bench_full.json written by graft.Bench.

Adjudication per shared query, fully mechanical:
 1. normalize by calibration_sustained (pure-compute phase probe);
    inside the wobble band -> '~' (no call).
 2. out-of-band rows whose measured plan CONTAINS shuffle exchanges
    (queries_exchanges, recorded by graft.Bench since round 12; B side
    preferred, A side fallback, assumed exchange-bearing when neither
    side records it) are RE-normalized by calibration_shuffle — the
    probe that tracks the scheduler/exchange path no compute probe
    sees. In band under that probe -> '~shuffle-phase' (no call).
 3. rows out of band under EVERY applicable probe are 'faster' or
    'RECHECK' (slower) — a RECHECK row's next step is an isolated
    median-of-3 re-run (sbt "runMain graft.Bench <name>" with
    SPARK_GRAFT_BENCH_RUNS=3), never a narrative call.

Wobble band (BASELINE.md §Round-8): sub-half-second rows have measured
+/-40% run-to-run noise, others +/-15%. Medians: graft.Bench records
"runs" — compares between runs=1 artifacts inherit single-sample noise;
the canonical committed artifact is produced with SPARK_GRAFT_BENCH_RUNS=3.
This is a development tool only — the engine never depends on it.
"""
import sys, os, json, re


def load(path):
    d = json.load(open(path))
    if "tail" in d:  # driver wrapper: bench line embedded in the tail
        m = re.findall(r'\{"metric":"total".*\}', d["tail"])
        if not m:
            raise SystemExit(f"{path}: no bench line in tail")
        d = json.loads(m[-1])
    return d


def probe(d, name):
    q = d.get("queries", {})
    v = d.get(name, q.get(name))
    return float(v) if v is not None else None


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    a, b = load(a_path), load(b_path)

    sa, sb = probe(a, "calibration_sustained"), probe(b, "calibration_sustained")
    sha, shb = probe(a, "calibration"), probe(b, "calibration")
    xa, xb = probe(a, "calibration_shuffle"), probe(b, "calibration_shuffle")
    if sa is None and sha is None:
        raise SystemExit(f"{a_path}: no calibration row at all")
    if sb is None and shb is None:
        raise SystemExit(f"{b_path}: no calibration row at all")
    # Both sustained probes exist -> use them (the round-8 finding: the
    # short probe misses sustained background load). Otherwise fall back
    # to the SHORT probe on BOTH sides — the units of the two probes
    # differ (the long burst amortizes setup ~5x better), so mixing them
    # would fabricate a phase delta larger than any engine change.
    if sa is not None and sb is not None:
        ca, cb, probe_name = sa, sb, "sustained"
    else:
        ca, cb, probe_name = sha, shb, "SHORT (one side predates the sustained " \
            "probe; sustained background load is invisible to this normalization)"
    have_shuffle = xa is not None and xb is not None
    # per-row exchange counts: B side preferred (current code), A fallback;
    # rows unknown to both are ASSUMED exchange-bearing (conservative: the
    # shuffle probe may excuse them, never condemn them)
    exch = dict(a.get("queries_exchanges", {}))
    exch.update({k: v for k, v in b.get("queries_exchanges", {}).items()
                 if v is not None and v >= 0})

    def rows_of(d):
        return {k: v for k, v in d.get("queries", {}).items()
                if not k.startswith("calibration") and not k.startswith("other_")
                and isinstance(v, (int, float)) and v >= 0}

    qa, qb = rows_of(a), rows_of(b)
    shared = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))

    rows = []
    n_shuffle_excused = 0
    for k in shared:
        na, nb = qa[k] / ca, qb[k] / cb
        ratio = nb / na if na > 0 else float("inf")
        band = 0.40 if max(qa[k], qb[k]) < 0.5 else 0.15
        sh_ratio = None
        if abs(ratio - 1) <= band:
            call = "~"
        else:
            exchanging = exch.get(k, 1)  # unknown -> assume exchange-bearing
            if have_shuffle and exchanging != 0:
                sh_ratio = (qb[k] / xb) / (qa[k] / xa) if qa[k] > 0 else float("inf")
                if abs(sh_ratio - 1) <= band:
                    call = "~shuffle-phase"
                    n_shuffle_excused += 1
                else:
                    call = "faster" if ratio < 1 else "RECHECK"
            else:
                call = "faster" if ratio < 1 else "RECHECK"
        rows.append((k, qa[k], qb[k], na, nb, ratio, sh_ratio, call))
    rows.sort(key=lambda r: -abs(r[5] - 1))

    lines = []
    lines.append(f"# Bench compare: {os.path.basename(a_path)} -> {os.path.basename(b_path)}")
    lines.append("")
    lines.append(f"- compute probe: {probe_name}; A={ca:.3f}, B={cb:.3f}")
    if have_shuffle:
        lines.append(f"- shuffle probe: A={xa:.3f}, B={xb:.3f} "
                     f"(ratio {xb/xa:.2f}) — exchange-bearing out-of-band rows "
                     "re-normalized by it")
    else:
        lines.append("- shuffle probe: MISSING on one side — exchange-bearing "
                     "rows cannot be shuffle-normalized; out-of-band rows need "
                     "isolated rechecks")
    ra_, rb_ = a.get("runs", 1), b.get("runs", 1)
    lines.append(f"- runs per row: A={ra_}, B={rb_}"
                 + ("" if min(ra_, rb_) > 1 else
                    " (single-sample side(s): per-row noise is NOT median-damped)"))
    lines.append("- NOTE: driver BENCH_r*.json lines fold the cheapest rows into "
                 "other_sum — 'removed since A' may just mean folded that round; "
                 "bench_full.json carries every row.")
    ta = sum(qa[k] for k in shared)
    tb = sum(qb[k] for k in shared)
    lines.append(f"- shared-query totals: raw {ta:.1f}s -> {tb:.1f}s "
                 f"(ratio {tb/ta:.2f}); normalized {ta/ca:.1f} -> {tb/cb:.1f} "
                 f"(ratio {(tb/cb)/(ta/ca):.2f})")
    if only_b:
        lines.append(f"- new in B ({len(only_b)}): {', '.join(only_b)}")
    if only_a:
        # round 13: graft.Bench runs the long tail as a single cold
        # execution reported under queries_cold — those rows are FOLDED,
        # not removed, and a cold reading must never be adjudicated
        # against a warm one
        cold_b = set(b.get("queries_cold", {}))
        folded = sorted(set(only_a) & cold_b)
        gone = sorted(set(only_a) - cold_b)
        if folded:
            lines.append(f"- folded to B's cold tail tier ({len(folded)}): "
                         f"{', '.join(folded)}")
        if gone:
            lines.append(f"- removed/renamed since A ({len(gone)}): {', '.join(gone)}")
    lines.append("")
    lines.append("Rows outside the wobble band (sub-0.5s rows: +/-40%, others +/-15%),")
    lines.append("sorted by normalized delta. '~' rows are inside the compute band;")
    lines.append("'~shuffle-phase' rows normalize into band under the shuffle probe;")
    lines.append("'RECHECK' rows need an isolated median-of-3 re-run "
                 "(SPARK_GRAFT_BENCH_RUNS=3 sbt \"runMain graft.Bench <name>\").")
    lines.append("")
    lines.append("| query | raw A | raw B | norm A | norm B | B/A | B/A(shuffle) | call |")
    lines.append("|---|---|---|---|---|---|---|---|")
    for k, raw_a, raw_b, na, nb, ratio, shr, call in rows:
        if call != "~":
            s = f"{shr:.2f}" if shr is not None else "-"
            lines.append(f"| {k} | {raw_a:.3f} | {raw_b:.3f} | {na:.3f} | {nb:.3f} "
                         f"| {ratio:.2f} | {s} | {call} |")
    n_in_band = sum(1 for r in rows if r[7] == "~")
    n_recheck = sum(1 for r in rows if r[7] == "RECHECK")
    lines.append("")
    lines.append(f"{n_in_band}/{len(rows)} shared rows inside the compute band; "
                 f"{n_shuffle_excused} shuffle-phase-normalized; "
                 f"{n_recheck} need isolated rechecks.")
    md = "\n".join(lines) + "\n"
    if out_path:
        open(out_path, "w").write(md)
        print(f"wrote {out_path}")
    else:
        print(md)


if __name__ == "__main__":
    main()
