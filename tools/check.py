#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads each parquet result written by `graft.Verify` plus oracle_sql.json,
runs every oracle query in DuckDB over the same fixture parquet, and
compares: column-name set, row count, and values (columns sorted by name,
rows sorted by all columns) — exact equality, with floats compared bitwise
first and reported with max-abs-diff when not identical.
"""
import json, math, sys
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

# Oracle-environment record (r9 q_stats_mi post-mortem: local DuckDB 1.0.0
# matched bit-for-bit while the driver's libm diverged at the 12th decimal —
# make both sides' versions visible in every artifact).
try:
    env = json.load(open(f"{out_dir}/env.json"))
    env_line = " ".join(f"{k}={v}" for k, v in sorted(env.items()))
except Exception:
    env_line = "(no env.json)"
print(f"oracle env: duckdb={duckdb.__version__}; engine: {env_line}")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: load/run error: {str(e)[:200]}")
        fail += 1
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}")
        fail += 1
        continue
    dt = [c for c in gcols if str(got[c].dtype) != str(exp[c].dtype)]
    if dt:
        print(f"FAIL {name}: dtype mismatch " +
              "; ".join(f"{c}: {got[c].dtype} vs {exp[c].dtype}" for c in dt))
        fail += 1
        continue
    got, exp = got[gcols], exp[ecols]
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fail += 1
        continue
    got = got.sort_values(gcols, na_position="first").reset_index(drop=True)
    exp = exp.sort_values(ecols, na_position="first").reset_index(drop=True)
    bad = None
    for c in gcols:
        a, b = got[c], exp[c]
        try:
            same = (a.astype(str) == b.astype(str)).all()
        except Exception:
            same = False
        if not same:
            try:
                d = (a.astype(float) - b.astype(float)).abs().max()
                bad = f"col {c} max abs diff {d!r}"
            except Exception:
                ga = a[(a.astype(str) != b.astype(str))].head(3).tolist()
                gb = b[(a.astype(str) != b.astype(str))].head(3).tolist()
                bad = f"col {c} mismatch e.g. {ga} vs {gb}"
            break
    if bad:
        print(f"FAIL {name}: {bad}")
        fail += 1
    else:
        note = "  [WARN empty result — vacuous match]" if len(got) == 0 else ""
        print(f"ok   {name} ({len(got)} rows){note}")
        ok += 1

print(f"\n{ok} ok, {fail} fail, {len(oracle)} total")
sys.exit(1 if fail else 0)
