#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view named after the table,
runs every oracle_sql.json query, loads the corresponding Spark result
parquet, sorts columns by name and rows by all columns, and compares
cell-by-cell (exact; floats must already be rounded by the queries).
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        # read the Spark dump FIRST: a missing/unreadable dump fails without
        # paying for the oracle SQL (the audit runs Verify for 1-2 queries
        # against the full oracle_sql.json — running all ~168 oracle
        # queries per mutation dominated gate_sensitivity wall time)
        try:
            sres = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols, srows = canon(sres.fetchall(), [c for c in sres.columns])
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            res = con.sql(sql)
            ocols, orows = canon(res.fetchall(), [c for c in res.columns])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            # Mirror the driver, which cannot sort array cells (pandas
            # factorize dies on numpy arrays): any array-typed column in
            # EITHER result is a hard failure here, not a tolerated sort.
            arr = [(c, str(t)) for c, t in zip(sres.columns, sres.types)
                   if str(t).endswith("[]")]
            arr += [(c, str(t)) for c, t in zip(res.columns, res.types)
                    if str(t).endswith("[]")]
            if arr:
                print(f"FAIL {name}: array-typed result column(s) {arr} — "
                      "the driver harness cannot hash array cells; use a "
                      "scalar fingerprint (size + fixed-point sum)")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: schema mismatch oracle={ocols} spark={scols}")
            n_fail += 1
        elif orows != srows:
            print(f"FAIL {name}: rows differ (oracle {len(orows)} vs spark {len(srows)})")
            for i, (a, b) in enumerate(zip(orows, srows)):
                if a != b:
                    print(f"  first diff at {i}:\n    oracle: {a}\n    spark : {b}")
                    break
            if len(orows) != len(srows):
                only_o = set(orows) - set(srows)
                only_s = set(srows) - set(orows)
                if only_o: print(f"  only in oracle: {list(only_o)[:3]}")
                if only_s: print(f"  only in spark : {list(only_s)[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
