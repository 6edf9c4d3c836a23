#!/usr/bin/env python3
"""sf-to-sf scaling analysis over two ScaleSweep artifacts.

Usage: tools/scale_ratio.py BENCH_sf1.json BENCH_sf10.json [data_factor]

Prints per-query time ratios sorted descending, a sublinearity summary
(share of queries whose time ratio is below the data factor), and row
ratios for the content-proportional queries. data_factor defaults 10.
"""
import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = a["queries"], b["queries"]
    ra, rb = a.get("rows", {}), b.get("rows", {})
    shared = sorted(set(qa) & set(qb))
    ratios = []
    for q in shared:
        if qa[q] > 0:
            ratios.append((qb[q] / qa[q], q, qa[q], qb[q],
                           ra.get(q), rb.get(q)))
    ratios.sort(reverse=True)
    sub = sum(1 for r in ratios if r[0] < factor)
    print(f"{len(shared)} shared queries; {sub}/{len(ratios)} sublinear "
          f"(time ratio < {factor}x data)")
    import statistics
    rs = [r[0] for r in ratios]
    print(f"ratio median={statistics.median(rs):.2f} "
          f"p90={sorted(rs)[int(0.9 * len(rs))]:.2f} max={max(rs):.2f}")
    print(f"totals: {a['value']}s -> {b['value']}s "
          f"({b['value'] / a['value']:.2f}x)")
    print("\nslowest-scaling 25:")
    for r, q, ta, tb, rowa, rowb in ratios[:25]:
        rr = f" rows {rowa}->{rowb}" if rowa and rowb else ""
        print(f"  {q:28s} {ta:7.2f}s -> {tb:8.2f}s  {r:5.2f}x{rr}")
    fails = b.get("failures") or {}
    if fails:
        print("\nfailures:", ", ".join(sorted(fails)))
    if b.get("skipped"):
        print("skipped:", ", ".join(b["skipped"]))


if __name__ == "__main__":
    main()
