#!/usr/bin/env python3
"""DuckDB oracle for llm_dedup_fuzzy_keep's CC -> survivors composition.

The MinHash pair stage is hash-dependent and legitimately non-oracle; the
composition downstream of it (connected components -> drop non-minimum
ids -> per-lang survivor stats) IS portable SQL. Given the kernel's
actual pair set (dumped by FuzzyKeepOracleSpec), replay that composition
with a DuckDB recursive CTE and emit the per-lang stats for comparison.

Usage: fuzzy_keep_oracle.py <pairs_parquet_dir> <documents_parquet> <out_csv>
"""
import sys

import duckdb

pairs, docs, out = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
con.execute(f"CREATE VIEW pairs AS SELECT * FROM '{pairs}/*.parquet'")
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{docs}'")
con.execute(f"""
COPY (
  WITH RECURSIVE edges AS (
    SELECT a_id AS a, b_id AS b FROM pairs
    UNION SELECT b_id, a_id FROM pairs
  ), reach AS (
    SELECT a AS id, b AS r FROM edges
    UNION SELECT a AS id, a AS r FROM edges
    UNION SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a
  ), cc AS (
    SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
  ), dropped AS (
    SELECT id AS doc_id FROM cc WHERE id <> cluster_id
  )
  SELECT lang, count(*) AS n_kept, sum(n_chars) AS kept_chars
  FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
  GROUP BY lang ORDER BY lang
) TO '{out}' (HEADER, DELIMITER ',');
""")
