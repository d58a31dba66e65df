#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [--staged] [--only a,b,c]
                              [--mem 48GB] [--json out.json]

Reads each parquet result written by `graft.Verify` plus oracle_sql.json,
runs every oracle query in DuckDB over the same fixture parquet, and
compares: column-name set, row count, and values (columns sorted by name,
rows sorted by all columns) — exact equality, with floats compared bitwise
first and reported with max-abs-diff when not identical.

--staged (the sf0.1 path): DuckDB inlines plain CTEs at every reference,
so the unrolled trained-artifact replays (k-means / PQ / SGNS / GD chains
that reference a trained frame dozens of times) re-execute their subtree
multiplicatively and blow past 100 GB at sf0.1 (SURVEY §17). Staging
splits each top-level non-recursive CTE into `CREATE TEMP TABLE <name> AS
<body>` executed in order — every CTE body runs EXACTLY ONCE, the
generalized form of the `AS MATERIALIZED` trick from q_graph_louvain2 —
then runs the final SELECT against the temp tables and drops them. CTE
semantics are preserved: later bodies see earlier temps (same as CTE
shadowing), self-references during creation resolve to the base view
(temp doesn't exist yet), and WITH RECURSIVE queries run unstaged.
A temp_directory pragma lets the staged temps spill to disk.
"""
import json, math, os, re, sys, time
import duckdb

pos, flags = [], {}
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a in ("--staged",):
        flags["staged"] = True
    elif a in ("--only", "--mem", "--json"):
        flags[a[2:]] = argv[i + 1]
        i += 1
    else:
        pos.append(a)
    i += 1

sf_dir = pos[0] if len(pos) > 0 else "/root/testdata/sf0.001"
out_dir = pos[1] if len(pos) > 1 else "/tmp/graft_verify"
staged = flags.get("staged", False)
only = set(flags["only"].split(",")) if "only" in flags else None

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    # driver fixtures are single files; Spark-written fixtures (e.g. the
    # GenScaledSf benchdata/sf1 set) are directories of part files
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'")
if staged:
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql(f"SET memory_limit='{flags.get('mem', '48GB')}'")


def _skip_ws_comments(s, i):
    while i < len(s):
        if s[i].isspace():
            i += 1
        elif s[i:i + 2] == "--":
            nl = s.find("\n", i)
            i = len(s) if nl < 0 else nl + 1
        else:
            break
    return i


def split_ctes(sql):
    """Split a top-level `WITH a AS (...), b(cols) AS (...) <final>` chain
    into ([(name, collist_or_None, body)...], final). Returns None when
    there is no top-level WITH or the chain is RECURSIVE (staged
    execution would change the fixpoint semantics). The scanner respects
    single-quoted strings (with '' escapes) and `--` line comments, so
    parens inside either never unbalance the depth count."""
    s = sql.strip()
    if not re.match(r"WITH\b", s, re.I) or re.match(r"WITH\s+RECURSIVE\b", s, re.I):
        return None
    i = 4  # past WITH
    ctes = []
    while True:
        i = _skip_ws_comments(s, i)
        m = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)\s*(\([A-Za-z0-9_,\s]*\))?"
                       r"\s*AS\s+(MATERIALIZED\s+)?\(", re.I).match(s, i)
        if not m:
            return None  # unparseable — caller runs the SQL unstaged
        name, cols = m.group(1), m.group(2)
        depth, j = 1, m.end()
        while depth > 0 and j < len(s):
            c = s[j]
            if c == "'":
                j += 1
                while j < len(s):
                    if s[j] == "'":
                        if j + 1 < len(s) and s[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
            elif c == "-" and s[j:j + 2] == "--":
                j = s.find("\n", j)
                if j < 0:
                    return None
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if depth != 0:
            return None
        ctes.append((name, cols, s[m.end():j - 1]))
        j = _skip_ws_comments(s, j)
        if j < len(s) and s[j] == ",":
            i = j + 1
            continue
        return ctes, s[j:].strip()


def run_oracle(sql):
    """Run one oracle query; in --staged mode materialize each top-level
    CTE that is REFERENCED MORE THAN ONCE downstream as a temp table, so
    no CTE body executes more than once (the multiplicative-re-execution
    fix) — while single-reference CTEs stay inline so DuckDB keeps its
    filter/projection pushdown into them (materializing everything turned
    lazily-pruned intermediates into multi-10-GB spills). Inline CTEs may
    reference earlier temps by name; temps may be built FROM a rewritten
    WITH carrying the still-inline prefix."""
    if not staged:
        return con.sql(sql).df()
    parts = split_ctes(sql)
    if parts is None:
        return con.sql(sql).df()
    ctes, final = parts
    # downstream reference count per CTE name (identifier occurrences in
    # later bodies + the final select). Miscounting only shifts a CTE
    # between inline/temp execution — results are identical either way.
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
            src = f"SELECT * FROM ({body}) AS __cte_src{cols}" if cols else body
            con.sql(f'CREATE TEMP TABLE "{name}" AS {with_prefix()}{src}')
            made.append(name)
        return con.sql(f"{with_prefix()}{final}").df()
    finally:
        for name in reversed(made):
            con.sql(f'DROP TABLE IF EXISTS "{name}"')


# Oracle-environment record (r9 q_stats_mi post-mortem: local DuckDB 1.0.0
# matched bit-for-bit while the driver's libm diverged at the 12th decimal —
# make both sides' versions visible in every artifact).
try:
    env = json.load(open(f"{out_dir}/env.json"))
    env_line = " ".join(f"{k}={v}" for k, v in sorted(env.items()))
except Exception:
    env_line = "(no env.json)"
mode = " [staged]" if staged else ""
print(f"oracle env: duckdb={duckdb.__version__}{mode}; engine: {env_line}")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
ok = fail = 0
report = {}
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        exp = run_oracle(sql)
    except Exception as e:
        print(f"FAIL {name}: load/run error: {str(e)[:200]}")
        report[name] = {"ok": False, "err": str(e)[:200]}
        fail += 1
        continue
    dt_s = time.time() - t0
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}")
        report[name] = {"ok": False, "err": "columns"}
        fail += 1
        continue
    dt = [c for c in gcols if str(got[c].dtype) != str(exp[c].dtype)]
    if dt:
        print(f"FAIL {name}: dtype mismatch " +
              "; ".join(f"{c}: {got[c].dtype} vs {exp[c].dtype}" for c in dt))
        report[name] = {"ok": False, "err": "dtype"}
        fail += 1
        continue
    got, exp = got[gcols], exp[ecols]
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        report[name] = {"ok": False, "err": f"rows {len(got)} vs {len(exp)}"}
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
        report[name] = {"ok": False, "err": bad}
        fail += 1
    else:
        note = "  [WARN empty result — vacuous match]" if len(got) == 0 else ""
        print(f"ok   {name} ({len(got)} rows, {dt_s:.1f}s){note}")
        report[name] = {"ok": True, "rows": len(got), "oracle_sec": round(dt_s, 2)}
        ok += 1

if "json" in flags:
    with open(flags["json"], "w") as f:
        json.dump({"sf_dir": sf_dir, "staged": staged, "ok": ok, "fail": fail,
                   "duckdb": duckdb.__version__, "queries": report}, f, indent=1)

print(f"\n{ok} ok, {fail} fail, {len(oracle)} total")
sys.exit(1 if fail else 0)
