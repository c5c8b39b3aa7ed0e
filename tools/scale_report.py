#!/usr/bin/env python3
"""Per-query scale-factor report: an sf1 (10x data) bench window vs the
sf0.1 canonical medians. Flags super-linear shapes (>6x for 10x data,
the round-12 verdict criterion) for focused re-measure / plan fix /
documented waiver.

Usage: python3 tools/scale_report.py <bench_sf1.json> [canon.json] [threshold]
"""
import json, sys

bench = json.load(open(sys.argv[1]))
canon = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BENCH_CANON.json"))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0

qs = bench["queries"]
rows = []
for name, rec in qs.items():
    med = rec["med"] if isinstance(rec, dict) else rec
    c = canon.get(name)
    if c is None or c <= 0:
        rows.append((float("nan"), med, c, name))
        continue
    rows.append((med / c, med, c, name))

known = [r for r in rows if r[0] == r[0]]
known.sort(reverse=True)
import statistics
sfs = [r[0] for r in known]
print(f"n={len(known)} queries with canon; median scale {statistics.median(sfs):.2f}x; "
      f"p90 {sorted(sfs)[int(len(sfs)*0.9)]:.2f}x; max {max(sfs):.2f}x")
over = [r for r in known if r[0] > thr]
print(f"\n{len(over)} queries over {thr}x (10x data):")
for sf, med, c, name in over:
    adj = bench.get("adjudication", {}).get(name)
    extra = f" adjudicated={json.dumps(adj)}" if adj else ""
    print(f"  {sf:6.2f}x  med={med:7.3f}s canon={c:6.3f}s  {name}{extra}")
print("\ntop 25 by scale factor:")
for sf, med, c, name in known[:25]:
    print(f"  {sf:6.2f}x  med={med:7.3f}s canon={c:6.3f}s  {name}")
nocanon = [r for r in rows if r[0] != r[0]]
if nocanon:
    print(f"\nno canon ({len(nocanon)}): " + ", ".join(r[3] for r in nocanon))

# Shuffle-growth accounting (round 13): when a BASE artifact with
# per-query metrics is supplied (4th arg, e.g. a metrics-bearing sf0.1
# window), compare shuffle-write bytes at the two SFs. Wall-clock can
# hide super-linear data movement inside a warm window; bytes cannot.
if len(sys.argv) > 4:
    base = json.load(open(sys.argv[4]))["queries"]
    grow = []
    for name, rec in qs.items():
        b = base.get(name)
        if not (isinstance(rec, dict) and isinstance(b, dict)):
            continue
        hi, lo = rec.get("shw_mb"), b.get("shw_mb")
        if hi is None or lo is None or lo < 0.5:  # sub-MB base = noise
            continue
        grow.append((hi / lo, lo, hi, name))
    grow.sort(reverse=True)
    over = [g for g in grow if g[0] > 15.0]  # 10x data: >15x bytes flagged
    print(f"\nshuffle-write growth (n={len(grow)} with >=0.5MB base): "
          f"median {statistics.median([g[0] for g in grow]):.1f}x; "
          f"{len(over)} over 15x")
    for g, lo, hi, name in grow[:20]:
        print(f"  {g:6.1f}x  {lo:8.1f}MB -> {hi:9.1f}MB  {name}")
