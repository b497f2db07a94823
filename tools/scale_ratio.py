#!/usr/bin/env python3
"""Per-query scaling ratios between two BENCH_full.json artifacts.

Usage: python3 tools/scale_ratio.py <bench_small.json> <bench_big.json> [decade]

`decade` is the data-size factor between the two runs (default 10).
Prints per-query time ratio big/small and the implied scaling exponent
log_decade(ratio) — exponent 1.0 = linear, <1 = amortizing fixed costs,
>1 = superlinear. Sorted worst-exponent first. Times below a noise floor
(0.3 s in the SMALL run) are flagged: their ratio is dominated by
per-query fixed overhead, not data work.
"""
import json
import math
import sys


def main(small_path, big_path, decade=10.0):
    with open(small_path) as f:
        small = json.load(f)
    with open(big_path) as f:
        big = json.load(f)
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb))
    rows = []
    for q in common:
        a, b = qs[q], qb[q]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        rows.append((math.log(ratio) / math.log(decade), ratio, a, b, q))
    rows.sort(reverse=True)
    print(f"{'exponent':>8} {'ratio':>7} {'small':>7} {'big':>8}  query")
    for exp, ratio, a, b, q in rows:
        noise = " (noise-floor)" if a < 0.3 else ""
        print(f"{exp:8.2f} {ratio:7.2f} {a:7.2f} {b:8.2f}  {q}{noise}")
    tot_s = sum(qs[q] for q in common)
    tot_b = sum(qb[q] for q in common)
    overall = math.log(tot_b / tot_s) / math.log(decade)
    print(f"\ntotals: small={tot_s:.1f}s big={tot_b:.1f}s "
          f"ratio={tot_b / tot_s:.2f} exponent={overall:.2f} "
          f"({len(common)} common queries)")
    bad = [(q, e) for e, r, a, b, q in rows if e > 1.2 and a >= 0.3]
    if bad:
        print("exponent > 1.2 (excluding noise-floor):",
              ", ".join(f"{q}={e:.2f}" for q, e in bad))
    else:
        print("no query above exponent 1.2 (excluding noise-floor)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
