#!/usr/bin/env python3
"""Oracle result-dtype lint — guards against the r9 dashboard-gate bug.

The driver's verify harness hashes DuckDB oracle results and Spark
parquet results independently; a value-equal result still hash-mismatches
if DuckDB types a column outside the dtype surface Spark emits. The
canonical trap: DuckDB `sum(INTEGER)` returns HUGEINT (INT128) while
Spark's `sum(int)` returns BIGINT — six rounds of red on the two
dashboard gates, root-caused in r9 as exactly this.

This lint executes every `SparkEntry.oracleSql` statement through DuckDB
against the sf parquet tables and fails if any result column's type is
outside the allowlist of types Spark's parquet writer can emit
one-to-one (BIGINT, INTEGER, SMALLINT, TINYINT, DOUBLE, FLOAT, VARCHAR,
BOOLEAN, DATE, TIMESTAMP). HUGEINT, DECIMAL, UHUGEINT, etc. are hard
failures — and so are LIST columns (`ELEM[]`): the driver harness sorts
result rows with pandas, which cannot hash numpy-array cells, so ANY
array-typed result column dies with "unhashable type: numpy.ndarray"
before comparison (the r10 txn_commit/pitr_roundtrip reds). Reduce
vectors to scalar fingerprints (size + fixed-point content sum) instead.

Usage: python3 tools/oracle_type_lint.py <sfDir> <oracleSqlJson>
  (get the json via:
   bash tools/run_main.sh graft.Verify <sfDir> /tmp/out __none__)
"""
import json, os, re, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
           "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}

def type_ok(t):
    t = str(t)
    if re.fullmatch(r".*\[\]", t):  # LIST types print as ELEM[]
        return False  # arrays are never driver-safe (pandas can't hash them)
    return t in ALLOWED

def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(oracle_json) as f:
        oracles = json.load(f)
    n_bad = n_err = 0
    for name, sql in sorted(oracles.items()):
        try:
            res = con.sql(sql)
            bad = [(c, str(ty)) for c, ty in zip(res.columns, res.types)
                   if not type_ok(ty)]
        except Exception as e:
            print(f"ERROR {name}: oracle failed to execute: {e}")
            n_err += 1
            continue
        if bad:
            print(f"BAD  {name}: {bad}")
            n_bad += 1
    print(f"== {len(oracles)} oracles, {n_bad} with disallowed column "
          f"types, {n_err} execution errors ==")
    return 1 if (n_bad or n_err) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
