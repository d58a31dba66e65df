#!/usr/bin/env python3
"""Time oracle SQL (optionally staged) against a fixture dir WITHOUT
needing Verify outputs — the profiling companion to check.py for making
heavy oracles (the ANN family at sf1) tractable.

Usage: python3 tools/oracle_time.py <sfDir> <oracle_sql.json> q1 [q2 ...]
       [--staged] [--mem 48GB]

Reuses check.py's split_ctes/run_oracle by exec'ing only its function
defs (check.py's module level also opens fixtures/outputs, so a plain
import would run the whole gate).
"""
import json, os, re, sys, time
import duckdb

# index-based flag parsing (oracle_probe.py convention): --mem's VALUE is
# consumed at its own index, so a query name that happens to equal the mem
# string can never be swallowed
argv = sys.argv[1:]
staged, mem, args = False, "48GB", []
i = 0
while i < len(argv):
    if argv[i] == "--staged":
        staged = True
    elif argv[i] == "--mem":
        mem = argv[i + 1]
        i += 1
    else:
        args.append(argv[i])
    i += 1
sf_dir, oracle_path, names = args[0], args[1], args[2:]

src = open(os.path.join(os.path.dirname(__file__), "check.py")).read()
# keep only the def blocks check.py declares before its main loop
defs = re.findall(r"(?ms)^(def _skip_ws_comments.*?(?=^def ))", src)
defs += re.findall(r"(?ms)^(def split_ctes.*?(?=^def ))", src)
ns = {"re": re, "json": json}
exec("".join(defs), ns)
split_ctes = ns["split_ctes"]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    s = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{s}'")
os.makedirs("/tmp/duckdb_spill", exist_ok=True)
con.sql("SET temp_directory='/tmp/duckdb_spill'")
con.sql(f"SET memory_limit='{mem}'")


def run_staged(sql):
    parts = split_ctes(sql)
    if parts is None:
        return con.sql(sql).df()
    ctes, final = parts
    refs = {name: 0 for name, _, _ in ctes}
    later = [body for _, _, body in ctes] + [final]
    for idx, (name, _, _) in enumerate(ctes):
        pat = re.compile(r"\b" + re.escape(name) + r"\b")
        refs[name] = sum(len(pat.findall(b)) for b in later[idx + 1:])
    made, inline = [], []
    def with_prefix():
        if not inline:
            return ""
        return "WITH " + ",\n".join(
            f"{n}{c or ''} AS ({b})" for n, c, b in inline) + "\n"
    try:
        for name, cols, body in ctes:
            if refs[name] <= 1:
                inline.append((name, cols, body))
                continue
            s = f"SELECT * FROM ({body}) AS __cte_src{cols}" if cols else body
            t0 = time.time()
            con.sql(f'CREATE TEMP TABLE "{name}" AS {with_prefix()}{s}')
            dt = time.time() - t0
            if dt > 1:
                print(f"    temp {name}: {dt:.1f}s")
            made.append(name)
        t0 = time.time()
        out = con.sql(f"{with_prefix()}{final}").df()
        dt = time.time() - t0
        if dt > 1:
            print(f"    final: {dt:.1f}s")
        return out
    finally:
        for name in reversed(made):
            con.sql(f'DROP TABLE IF EXISTS "{name}"')


oracle = json.load(open(oracle_path))
for name in names:
    t0 = time.time()
    try:
        df = run_staged(oracle[name]) if staged else con.sql(oracle[name]).df()
        print(f"{name}: {time.time() - t0:.1f}s, {len(df)} rows")
    except Exception as e:
        print(f"{name}: ERROR after {time.time() - t0:.1f}s: {str(e)[:200]}")
