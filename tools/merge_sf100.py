#!/usr/bin/env python3
"""Merge the round-12 batched sf100 probe artifacts into one
BENCH_sf100_r12.json. The probe ran as separate JVMs per family batch
after a 29-query single-JVM run OOM'd in accumulated checkpoint blocks
(see BASELINE.md round 12) — each batch's queries/cold/rows/failures
maps are disjoint, so the merge is a union with per-batch provenance.
Usage: tools/merge_sf100.py out.json batchA.json batchA2.json ...
"""
import json, sys

out_path, *ins = sys.argv[1:]
merged = {"metric": "sweep_total_batched", "value": 0.0, "unit": "sec",
          "sf": "/tmp/graft_sf100", "ansi": True, "batched": True,
          "batches": [], "n_queries": 0, "n_clean": 0, "skipped": [],
          "queries": {}, "cold": {}, "rows": {}, "failures": {},
          "passes_by_batch": {}}
for p in ins:
    d = json.load(open(p))
    merged["value"] += d["value"]
    merged["batches"].append({"file": p.split("/")[-1], "total": d["value"],
                              "passes": d.get("passes"),
                              "loadavg": d.get("loadavg")})
    merged["n_queries"] += d["n_queries"]
    merged["n_clean"] += d["n_clean"]
    for k in ("queries", "cold", "rows", "failures"):
        merged[k].update(d.get(k, {}))
    for s in d.get("skipped", []):
        if s not in merged["skipped"]:
            merged["skipped"].append(s)
    for q in d.get("queries", {}):
        merged["passes_by_batch"][q] = d.get("passes")
json.dump(merged, open(out_path, "w"), indent=None)
print(f"wrote {out_path}: {merged['n_clean']}/{merged['n_queries']} clean, "
      f"total {merged['value']:.1f}s, skipped {merged['skipped']}")
