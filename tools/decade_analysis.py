#!/usr/bin/env python3
"""Two-decade exponent analysis for the r13 scale rehearsals.

Reads the sf0.1 control, sf1, and sf10 bench artifacts and prints, per
query: exp(sf0.1->sf1), exp(sf1->sf10), the jump between decades, and
flags per the r10 rule (jump > 0.2 named; nothing new above 1.2 except
declared baselines). Usage:

    python3 tools/decade_analysis.py BENCH_r13_sf01_control.json \
        BENCH_scale_r13_sf1.json BENCH_scale_r13_sf10_clean.json
"""
import json, math, os, sys

# declared exact baselines with shipped escapes — single source of truth
# shared with the VERDICT/SURVEY declaration (see the _comment inside):
# tools/declared_baselines.json
with open(os.path.join(os.path.dirname(__file__),
                       'declared_baselines.json')) as f:
    DECLARED = {k: v for k, v in json.load(f).items()
                if not k.startswith('_')}

def load(p):
    d = json.load(open(p))
    return d['queries']

def main(c01, c1, c10):
    q01, q1, q10 = load(c01), load(c1), load(c10)
    rows = []
    dropped = []
    for q in sorted(q10):
        if q not in q1 or q not in q01:
            continue
        if q01[q] <= 0.03 or q1[q] <= 0.03 or q10[q] <= 0.03:
            # a <=30ms value at ANY scale is a failed/instant run, not a
            # measurement — name it loudly instead of computing a fake exp
            dropped.append(q)
            continue
        e1 = math.log10(q1[q] / q01[q])
        e2 = math.log10(q10[q] / q1[q])
        rows.append((q, q01[q], q1[q], q10[q], e1, e2, e2 - e1))
    rows.sort(key=lambda r: -r[5])
    print(f"{'query':30s} {'sf0.1':>7s} {'sf1':>8s} {'sf10':>8s} "
          f"{'exp1':>6s} {'exp2':>6s} {'jump':>6s}")
    for q, a, b, c, e1, e2, j in rows:
        flag = ''
        if e2 > 1.2:
            flag = ' DECLARED' if q in DECLARED else ' **OVER**'
        elif j > 0.2:
            flag = ' jump>0.2'
        print(f"{q:30s} {a:7.2f} {b:8.2f} {c:8.2f} {e1:6.2f} {e2:6.2f} "
              f"{j:6.2f}{flag}")
    t01 = sum(r[1] for r in rows); t1 = sum(r[2] for r in rows)
    t10 = sum(r[3] for r in rows)
    print(f"\nshared-query totals: sf0.1 {t01:.1f}s  sf1 {t1:.1f}s  "
          f"sf10 {t10:.1f}s")
    print(f"overall exponents: sf0.1->sf1 {math.log10(t1/t01):.3f}  "
          f"sf1->sf10 {math.log10(t10/t1):.3f}")
    over = [r[0] for r in rows if r[5] > 1.2 and r[0] not in DECLARED]
    jumps = [r[0] for r in rows if r[6] > 0.2 and r[5] <= 1.2]
    print(f"\n>1.2 non-declared: {over}")
    print(f"jump>0.2 (named, r10 rule): {jumps}")
    if dropped:
        print(f"DROPPED (<=30ms somewhere — failed/instant runs, "
              f"no exponent computed): {dropped}")

if __name__ == '__main__':
    main(*sys.argv[1:4])
