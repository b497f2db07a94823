#!/usr/bin/env python3
"""Merge per-query seconds across bench logs/artifacts into one
min-of-available-runs artifact (used for the r13 clean-sf10 decade,
where run 1 lives in a log from a session that was killed mid-run-2).

Usage:
    python3 tools/merge_bench_runs.py OUT.json NOTE \
        artifact_or_log [artifact_or_log ...]

Inputs may be BENCH json artifacts (their "queries" map is taken) or
raw bench logs (every `[bench] runN <query> rows=<r> <t>s` line with
t > 0 is taken; rows=-1 lines are FAILED runs — the query threw — and
are skipped, since a failure's wall time says nothing about the query's
cost). Output: queries = per-query min, value = sum of mins,
runs_merged = list of inputs with per-input query coverage.
"""
import json, re, sys


def read_one(path):
    if path.endswith('.json'):
        return dict(json.load(open(path))['queries'])
    vals = {}
    for line in open(path, errors='replace'):
        m = re.match(r'\[bench\] run\d+ (\S+)\s+rows=(\S+)\s+([\d.]+)s', line)
        if m and m.group(2) != '-1' and float(m.group(3)) > 0:
            q, t = m.group(1), float(m.group(3))
            vals[q] = min(vals.get(q, t), t)
    return vals


def main():
    out, note, inputs = sys.argv[1], sys.argv[2], sys.argv[3:]
    merged, coverage = {}, {}
    for p in inputs:
        vals = read_one(p)
        coverage[p] = len(vals)
        for q, t in vals.items():
            merged[q] = min(merged.get(q, t), t)
    doc = {
        'metric': 'total', 'value': round(sum(merged.values()), 1),
        'unit': 'sec', 'runs': f'min over {len(inputs)} inputs',
        'note': note, 'runs_merged': coverage,
        'queries': {q: merged[q] for q in sorted(merged)},
    }
    json.dump(doc, open(out, 'w'), indent=1)
    print(f'{out}: {len(merged)} queries, total {doc["value"]}s '
          f'(coverage: {coverage})')


if __name__ == '__main__':
    main()
