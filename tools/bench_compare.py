#!/usr/bin/env python3
"""Phase-normalized round-over-round bench comparison (round-8 verdict
ask #3: the judge faced a 93-vs-72s ambiguity that was pure machine
phase; this tool removes the re-derivation).

Usage: python3 tools/bench_compare.py <BENCH_a.json> <BENCH_b.json> [out.md]

Accepts either the driver's BENCH_r{N}.json wrapper (the bench line is
embedded in its "tail") or a bench_full.json written by graft.Bench.
Per query present in both rounds, reports t/calibration_sustained on
each side and the normalized ratio b/a. Rounds that predate the
sustained probe (r7 and earlier) fall back to the SHORT calibration and
are flagged short-probe-only — their normalization is weaker by the
round-8 finding (the short probe misses sustained background load).

Wobble band (BASELINE.md §Round-8): sub-half-second rows have measured
+/-40% run-to-run noise, others +/-15%; ratios inside the band are
reported as '~' (no call). This is a development tool only — the engine
never depends on it.
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


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    a, b = load(a_path), load(b_path)

    def cals(d, path):
        q = d.get("queries", {})
        sus = d.get("calibration_sustained", q.get("calibration_sustained"))
        short = d.get("calibration", q.get("calibration"))
        if sus is None and short is None:
            raise SystemExit(f"{path}: no calibration row at all")
        return (float(sus) if sus is not None else None,
                float(short) if short is not None else None)

    sa, sha = cals(a, a_path)
    sb, shb = cals(b, b_path)
    # Both probes exist on both sides -> use sustained (the round-8
    # finding: the short probe misses sustained background load). If
    # either side predates the sustained probe, fall back to the SHORT
    # probe on BOTH sides — the units of the two probes differ (the long
    # burst amortizes setup ~5x better), so mixing them would fabricate
    # a phase delta larger than any engine change.
    if sa is not None and sb is not None:
        ca, cb, probe = sa, sb, "sustained"
    else:
        ca, cb, probe = sha, shb, "SHORT (one side predates the sustained probe; " \
            "sustained background load is invisible to this normalization)"
    a_short = b_short = probe != "sustained"
    qa = {k: v for k, v in a.get("queries", {}).items()
          if not k.startswith("calibration") and not k.startswith("other_")
          and isinstance(v, (int, float)) and v >= 0}
    qb = {k: v for k, v in b.get("queries", {}).items()
          if not k.startswith("calibration") and not k.startswith("other_")
          and isinstance(v, (int, float)) and v >= 0}

    shared = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))

    rows = []
    for k in shared:
        na, nb = qa[k] / ca, qb[k] / cb
        ratio = nb / na if na > 0 else float("inf")
        band = 0.40 if max(qa[k], qb[k]) < 0.5 else 0.15
        call = "~" if abs(ratio - 1) <= band else ("faster" if ratio < 1 else "SLOWER")
        rows.append((k, qa[k], qb[k], na, nb, ratio, call))
    rows.sort(key=lambda r: -abs(r[5] - 1))

    lines = []
    lines.append(f"# Bench compare: {os.path.basename(a_path)} -> {os.path.basename(b_path)}")
    lines.append("")
    lines.append(f"- normalization probe: {probe}; A={ca:.3f}, B={cb:.3f}")
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
        lines.append(f"- removed/renamed since A ({len(only_a)}): {', '.join(only_a)}")
    lines.append("")
    lines.append("Rows outside the wobble band (sub-0.5s rows: +/-40%, others +/-15%),")
    lines.append("sorted by normalized delta. '~' rows are inside the band (no call).")
    lines.append("")
    lines.append("| query | raw A | raw B | norm A | norm B | B/A | call |")
    lines.append("|---|---|---|---|---|---|---|")
    for k, ra, rb, na, nb, ratio, call in rows:
        if call != "~":
            lines.append(f"| {k} | {ra:.3f} | {rb:.3f} | {na:.3f} | {nb:.3f} | {ratio:.2f} | {call} |")
    n_in_band = sum(1 for r in rows if r[6] == "~")
    lines.append("")
    lines.append(f"{n_in_band}/{len(rows)} shared rows are inside the wobble band.")
    md = "\n".join(lines) + "\n"
    if out_path:
        open(out_path, "w").write(md)
        print(f"wrote {out_path}")
    else:
        print(md)


if __name__ == "__main__":
    main()
