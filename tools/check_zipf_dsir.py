#!/usr/bin/env python3
"""Cross-check the ZipfScale DSIR weights against the DuckDB HUGEINT twin.

Usage: python3 tools/check_zipf_dsir.py [target/zipf_dsir]

Loads the harness-generated corpus parquet as `corpus`, runs the
emitted oracle SQL (TextCtes.dsirWeightsOver — HUGEINT intermediates),
and full-joins against the Spark weights parquet on
(doc_id, n_tokens, score_micro, avg_micro). Exit 0 iff every row
matches — the gate-scale integer-parity proof in the wrap-prone
Zipfian regime.
"""
import sys

import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "target/zipf_dsir"
con = duckdb.connect()
con.execute(
    f"CREATE VIEW corpus AS SELECT * FROM '{out_dir}/corpus.parquet/*.parquet'")
con.execute(
    f"CREATE VIEW spark_w AS SELECT * FROM '{out_dir}/weights.parquet/*.parquet'")
oracle_sql = open(f"{out_dir}/oracle_sql.txt").read()
con.execute(f"CREATE TABLE oracle_w AS {oracle_sql}")

n_spark, = con.execute("SELECT count(*) FROM spark_w").fetchone()
n_oracle, = con.execute("SELECT count(*) FROM oracle_w").fetchone()
mismatch, = con.execute("""
    SELECT count(*) FROM spark_w s
    FULL JOIN oracle_w o USING (doc_id)
    WHERE s.n_tokens IS DISTINCT FROM o.n_tokens
       OR s.score_micro IS DISTINCT FROM o.score_micro
       OR s.avg_micro IS DISTINCT FROM o.avg_micro
""").fetchone()
print(f"spark rows={n_spark} oracle rows={n_oracle} mismatches={mismatch}")
if mismatch:
    for row in con.execute("""
        SELECT s.doc_id, s.score_micro, o.score_micro
        FROM spark_w s FULL JOIN oracle_w o USING (doc_id)
        WHERE s.score_micro IS DISTINCT FROM o.score_micro LIMIT 5
    """).fetchall():
        print("  diff:", row)
sys.exit(0 if (mismatch == 0 and n_spark == n_oracle) else 1)
