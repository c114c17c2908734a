#!/usr/bin/env python3
"""Compare two bench JSON records (full-name BENCH_LOCAL.json lines or
driver BENCH_rNN.json files with a `parsed.queries` map). Prints per-query
speedups sorted by delta, plus totals and geomean.

Usage: bench_compare.py <prev.json> <now.json> [threshold_pct]
"""
import json, math, sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    qs = d["queries"]
    # driver records key by short name (qNN); full records by long name
    return {k.split("_")[0]: v for k, v in qs.items()}


def main():
    prev, now = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    common = sorted(set(prev) & set(now))
    rows = [(q, prev[q], now[q], prev[q] / now[q]) for q in common]
    rows.sort(key=lambda r: r[3])
    print(f"{'query':8} {'prev':>8} {'now':>8} {'speedup':>8}")
    for q, p, n, s in rows:
        flag = " <-- regressed" if s < 1 - thr / 100 else (" (improved)" if s > 1 + thr / 100 else "")
        if flag:
            print(f"{q:8} {p:8.3f} {n:8.3f} {s:8.2f}{flag}")
    tp, tn = sum(prev[q] for q in common), sum(now[q] for q in common)
    gm = math.exp(sum(math.log(s) for *_, s in rows) / len(rows))
    print(f"\ncommon={len(common)} total {tp:.1f}s -> {tn:.1f}s "
          f"(x{tp / tn:.3f}), geomean speedup {gm:.3f}")
    reg = [q for q, *_, s in rows if s < 1 - thr / 100]
    imp = [q for q, *_, s in rows if s > 1 + thr / 100]
    print(f"improved>{thr:.0f}%: {len(imp)}   regressed>{thr:.0f}%: {len(reg)}")


if __name__ == "__main__":
    main()
