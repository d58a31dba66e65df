#!/usr/bin/env python3
"""Probe oracle tractability at a big fixture: run each oracle (staged)
with a wall-clock cap, interrupting DuckDB past the cap, and report
ok/slow per query. Companion to oracle_time.py for planning at-scale
sweep subsets.

Usage: python3 tools/oracle_probe.py <sfDir> <outDir> [--cap 45]
       [--from qname] [--only a,b,c] [--json out.json]
"""
import json, os, re, sys, threading, time
import duckdb

argv = sys.argv[1:]
cap = 45.0
start_from = None
only = None
json_out = None
pos = []
i = 0
while i < len(argv):
    a = argv[i]
    if a == "--cap":
        cap = float(argv[i + 1]); i += 1
    elif a == "--from":
        start_from = argv[i + 1]; i += 1
    elif a == "--only":
        only = set(argv[i + 1].split(",")); i += 1
    elif a == "--json":
        json_out = argv[i + 1]; i += 1
    else:
        pos.append(a)
    i += 1
sf_dir, out_dir = pos[0], pos[1]

src = open(os.path.join(os.path.dirname(__file__), "check.py")).read()
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
con.sql("SET memory_limit='40GB'")


def run_staged(sql, timer=None):
    # the cap timer is cancelled HERE, right after the final fetchall —
    # cancelling only in the caller's finally left a window where the
    # interrupt could fire during the DROP cleanup (query mislabeled ERR)
    # or leave a pending interrupt that cancels the NEXT query
    def done():
        if timer is not None:
            timer.cancel()
    parts = split_ctes(sql)
    if parts is None:
        con.sql(sql).fetchall()
        done()
        return
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
            con.sql(f'CREATE TEMP TABLE "{name}" AS {with_prefix()}{s}')
            made.append(name)
        con.sql(f"{with_prefix()}{final}").fetchall()
        done()
    finally:
        for name in reversed(made):
            con.sql(f'DROP TABLE IF EXISTS "{name}"')


oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted(oracle)
if start_from:
    names = [n for n in names if n >= start_from]
if only:
    names = [n for n in names if n in only]
report = {}
for name in names:
    t0 = time.time()
    timer = threading.Timer(cap, con.interrupt)
    timer.start()
    try:
        run_staged(oracle[name], timer=timer)
        dt = time.time() - t0
        print(f"ok   {name} ({dt:.1f}s)", flush=True)
        report[name] = {"ok": True, "sec": round(dt, 1)}
    except Exception as e:
        dt = time.time() - t0
        kind = "SLOW" if dt >= cap - 1 else "ERR"
        print(f"{kind} {name} ({dt:.1f}s) {str(e)[:120]}", flush=True)
        report[name] = {"ok": False, "kind": kind, "sec": round(dt, 1)}
    finally:
        timer.cancel()
if json_out:
    json.dump(report, open(json_out, "w"), indent=1)
slow = [n for n, r in report.items() if not r.get("ok")]
print(f"\n{len(report) - len(slow)} ok, {len(slow)} capped/err: {slow}")
