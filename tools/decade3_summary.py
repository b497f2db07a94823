#!/usr/bin/env python3
"""Compose a third-decade summary artifact from the per-sf bench runs.

Usage:
    python3 tools/decade3_summary.py BENCH_decade3_sf1_rN.json \
        BENCH_decade3_sf10_rN.json BENCH_decade3_sf100_rN.json [note...]

Prints the summary JSON (per-key sf1/sf10/sf100 min-of-N + exp2/exp3,
declared-baseline flags from tools/declared_baselines.json, plus any
error rows carried verbatim) to stdout — redirect into the round's
BENCH_decade3_rN.json.
"""
import json, math, os, sys


def load_declared():
    # Loaded from main(), not import time, so a missing
    # declared_baselines.json cannot fail before usage prints.
    with open(os.path.join(os.path.dirname(__file__),
                           'declared_baselines.json')) as f:
        return {k: v for k, v in json.load(f).items()
                if not k.startswith('_')}


def main(p1, p10, p100, note):
    DECLARED = load_declared()
    a1, a10, a100 = (json.load(open(p)) for p in (p1, p10, p100))
    q1, q10, q100 = a1['queries'], a10['queries'], a100['queries']
    out = {}
    for k in sorted(set(q1) | set(q10) | set(q100)):
        row = {}
        if k in q1: row['sf1'] = q1[k]
        if k in q10: row['sf10'] = q10[k]
        if k in q100: row['sf100'] = q100[k]
        if k in q1 and k in q10 and q1[k] > 0.03:
            row['exp2'] = round(math.log10(q10[k] / q1[k]), 3)
        if k in q10 and k in q100 and q10[k] > 0.03:
            row['exp3'] = round(math.log10(q100[k] / q10[k]), 3)
        if k in DECLARED:
            row['declared'] = DECLARED[k]
        out[k] = row
    errors = {}
    for sf, art in (('sf1', a1), ('sf10', a10), ('sf100', a100)):
        for k, c in (art.get('errors') or {}).items():
            errors.setdefault(k, {})[sf] = c
    summary = {
        'metric': 'third_decade_sf1_sf10_sf100',
        'note': ' '.join(note) if note else '',
        'artifacts': [os.path.basename(p) for p in (p1, p10, p100)],
        'runs': {'sf1': a1.get('runs'), 'sf10': a10.get('runs'),
                 'sf100': a100.get('runs')},
        'med_min_ratio': {'sf1': a1.get('med_min_ratio'),
                          'sf10': a10.get('med_min_ratio'),
                          'sf100': a100.get('med_min_ratio')},
        'min_sec': out,
    }
    if errors:
        summary['errors'] = errors
    over = [k for k, r in out.items()
            if r.get('exp3', 0) > 1.2 and k not in DECLARED]
    summary['exp3_over_1.2_non_declared'] = over
    print(json.dumps(summary, indent=1))


if __name__ == '__main__':
    if len(sys.argv) < 4:
        sys.stderr.write(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:])
