#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For every query dumped by graft.Verify: read the Spark result parquet,
run the declared oracle SQL in DuckDB over the same sf tables, sort
columns by name on both sides, and diff values. Reports per-query
OK / ROWS / SCHEMA / VALUES mismatches so oracle SQL can be fixed
before the driver runs the real gate.
"""
import json
import math
import os
import sys

import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and fold float32 noise
        return round(v + 0.0, 6)
    return v

def check_tolerance(con, out_dir, name, spec):
    """Band compare for sketch-valued queries: columns sorted by name,
    rows zipped in query order; non-numeric values must be equal, numeric
    pass when |spark - exact| <= tolerance * max(|exact|, 1)."""
    tol = spec["tolerance"]
    try:
        s_rel = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols = [c[0] for c in s_rel.description]
        s_rows = s_rel.fetchall()
        o_rel = con.execute(spec["sql"])
        o_cols = [c[0] for c in o_rel.description]
        o_rows = o_rel.fetchall()
    except Exception as e:
        return False, f"err: {str(e)[:140]}"
    if sorted(s_cols) != sorted(o_cols):
        return False, f"schema spark={sorted(s_cols)} exact={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"rows spark={len(s_rows)} exact={len(o_rows)}"
    s_ix = [s_cols.index(c) for c in sorted(s_cols)]
    o_ix = [o_cols.index(c) for c in sorted(o_cols)]
    # Sort both sides by their NON-numeric columns before zipping (ADVICE
    # r9): the positional zip otherwise silently depends on every
    # tolerance-oracled query carrying a total ORDER BY through the
    # coalesce(1) write — true today, but an unordered future entry would
    # flap or mispair rows. ALL numeric columns are excluded from the key
    # (the sketch values being band-compared differ between sides, so
    # sorting by them would itself mispair); ties and all-numeric schemas
    # fall back to input order (stable sort / no-op).
    def is_numeric_col(k):
        # numbers.Number (minus bool) rather than (int, float): DuckDB
        # fetches DECIMAL columns as decimal.Decimal, which the narrower
        # isinstance would misclassify as a sort key over band-differing
        # values — reintroducing the row mispairing this sort prevents
        # (ADVICE r10).
        import numbers
        return any(isinstance(r[ix[k]], numbers.Number)
                   and not isinstance(r[ix[k]], bool)
                   for rows, ix in ((s_rows, s_ix), (o_rows, o_ix))
                   for r in rows)
    key_cols = [k for k in range(len(s_ix)) if not is_numeric_col(k)]
    def sort_side(rows, ix):
        def key(r):
            return [(r[ix[k]] is None, str(type(r[ix[k]])), str(r[ix[k]]))
                    for k in key_cols]
        return sorted(rows, key=key)
    s_rows = sort_side(s_rows, s_ix)
    o_rows = sort_side(o_rows, o_ix)
    max_rel = 0.0
    import numbers
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        for c in range(len(s_ix)):
            a, b = sr[s_ix[c]], orow[o_ix[c]]
            if isinstance(a, numbers.Number) and isinstance(b, numbers.Number) \
                    and not isinstance(a, bool) and not isinstance(b, bool):
                # float() both sides: a DuckDB DECIMAL arrives as
                # decimal.Decimal, and Decimal minus float raises TypeError
                a, b = float(a), float(b)
                rel = abs(a - b) / max(abs(b), 1.0)
                max_rel = max(max_rel, rel)
                # `not (rel <= tol)` so NaN (from a NaN spark value) fails
                # instead of slipping past a `rel > tol` comparison.
                if not (rel <= tol):
                    return False, (f"row {i} col {sorted(s_cols)[c]}: "
                                   f"spark={a} exact={b} rel={rel:.4f} > {tol}")
            elif a != b:
                return False, f"row {i} col {sorted(s_cols)[c]}: {a} != {b}"
    return True, f"rows={len(s_rows)} max_rel={max_rel:.4f} <= {tol}"


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # optional tolerance oracles for the approx family (sketch-valued
    # queries that cannot hash-match): {"name": {"sql": ..., "tolerance": t}}
    tolerances = {}
    tol_path = f"{out_dir}/tolerance_oracle.json"
    if os.path.exists(tol_path):
        with open(tol_path) as f:
            tolerances = json.load(f)

    dumped = sorted(d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = 0
    for name in dumped:
        if name not in oracles:
            if name in tolerances:
                ok, msg = check_tolerance(con, out_dir, name, tolerances[name])
                if ok:
                    print(f"TOLOK  {name:<28} {msg}")
                    n_ok += 1
                else:
                    print(f"TOLBAD {name:<28} {msg}")
                    n_bad += 1
                continue
            try:
                n = con.execute(
                    f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
                print(f"SKIP   {name:<28} (no oracle; rows={n})")
            except Exception as e:
                print(f"ERR    {name:<28} unreadable dump: {e}")
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [c[0] for c in spark_rel.description]
            s_rows = spark_rel.fetchall()
            o_rel = con.execute(oracles[name])
            o_cols = [c[0] for c in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"ERR    {name:<28} {str(e)[:160]}")
            n_bad += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"SCHEMA {name:<28} spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_bad += 1
            continue
        s_ix = [s_cols.index(c) for c in sorted(s_cols)]
        o_ix = [o_cols.index(c) for c in sorted(o_cols)]
        s_vals = [tuple(norm(r[i]) for i in s_ix) for r in s_rows]
        o_vals = [tuple(norm(r[i]) for i in o_ix) for r in o_rows]
        if len(s_vals) != len(o_vals):
            print(f"ROWS   {name:<28} spark={len(s_vals)} oracle={len(o_vals)}")
            n_bad += 1
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s_vals, o_vals)) if a != b]
        if diffs:
            i, a, b = diffs[0]
            print(f"VALUES {name:<28} {len(diffs)}/{len(s_vals)} rows differ; "
                  f"first at {i}: cols={sorted(s_cols)}\n"
                  f"       spark ={a}\n       oracle={b}")
            n_bad += 1
        else:
            print(f"OK     {name:<28} rows={len(s_vals)}")
            n_ok += 1
    # Tolerance-oracled queries count as "declared" too: a query whose dump
    # is absent (e.g. Verify caught and logged its failure) must surface as
    # NODUMP rather than silently vanish from the report.
    missing = (set(oracles) | set(tolerances)) - set(dumped)
    for name in sorted(missing):
        print(f"NODUMP {name:<28} (oracle declared but no spark dump)")
        n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {len(dumped) - n_ok - n_bad} skipped")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
