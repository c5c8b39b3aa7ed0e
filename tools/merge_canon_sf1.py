#!/usr/bin/env python3
"""Merge segmented sf1 bench artifacts into BENCH_CANON_SF1.json (the
sf-keyed canonical-median map the round-13 verdict asked for) and one
combined window artifact.

Usage: python3 tools/merge_canon_sf1.py out_combined.json seg1.json [seg2.json ...]

Each segment is one graft.Bench JSON line (fresh JVM per segment — the
segmentation bounds late-window GC accumulation, the round-13 sf1
window's failure mode). The canon map takes each query's `med`;
metrics (shw_mb etc.) ride along in the combined artifact.
"""
import json, sys

out_path = sys.argv[1]
segs = [json.load(open(p)) for p in sys.argv[2:]]

# Validation (round-14 ADVICE): a bad segment list must not silently
# corrupt the canon — segments must cover DISJOINT query sets (last-
# wins overwrite would hide a double-measured query) and agree on sf.
sfs = {s.get("sf") for s in segs}
assert len(sfs) == 1, f"segments disagree on sf: {sorted(map(str, sfs))}"
seen = {}
for p, s in zip(sys.argv[2:], segs):
    dup = set(s["queries"]) & set(seen)
    assert not dup, (f"overlapping query names between {p} and "
                     f"{sorted(seen[q] for q in dup)}: {sorted(dup)[:5]}")
    for q in s["queries"]:
        seen[q] = p

queries, failed = {}, []
for s in segs:
    queries.update(s["queries"])
    failed += s.get("failed", [])
failed = sorted(set(failed))

total = round(sum(q["med"] if isinstance(q, dict) else q
                  for q in queries.values()), 1)
combined = {
    "metric": "bench_total_sec", "value": total, "unit": "sec",
    "sf": segs[0].get("sf"), "segments": len(segs),
    "queries": queries, "failed": failed,
}
with open(out_path, "w") as f:
    json.dump(combined, f, indent=1, sort_keys=True)

canon = {n: (q["med"] if isinstance(q, dict) else q)
         for n, q in queries.items()}
with open("BENCH_CANON_SF1.json", "w") as f:
    json.dump(canon, f, indent=1, sort_keys=True)

print(f"{out_path}: {len(queries)} queries, total {total}s, "
      f"failed {failed}; BENCH_CANON_SF1.json: {len(canon)} medians")
