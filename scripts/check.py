#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare (columns sorted by name, rows sorted, exact value compare with
float tolerance reporting)."""
import hashlib, json, math, os, subprocess, sys
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
RUN_VERIFY = "--no-run" not in sys.argv
# optional 3rd positional arg: comma-separated query subset, forwarded
# to graft.Verify (without it every check runs the FULL verify)
SUBSET = next((a for a in sys.argv[3:] if not a.startswith("--")), "")

if RUN_VERIFY:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF_DIR} {OUT} {SUBSET}'.rstrip()],
        capture_output=True, text=True, cwd="/root/repo")
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print("VERIFY-ERR:", line)

con = duckdb.connect()
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

# ---- oracle-result cache -------------------------------------------------
# Some oracles are deliberately quadratic (all-pairs dedup arms): at sf0.1
# they cost 15-60 MINUTES each in DuckDB. The oracle result is a pure
# function of (source tables, SQL text), so cache it keyed by the SF dir,
# a size+mtime fingerprint of every table, and the SQL hash. Best-effort:
# any cache failure (exotic dtypes, unwritable dir) falls back to a live
# run, and a dtype-kind drift through the parquet round-trip invalidates
# the hit (the gate compares TYPED values, so fidelity beats speed).
ORACLE_CACHE = os.environ.get("GRAFT_ORACLE_CACHE", "/tmp/graft-oracle-cache")
def _table_fp():
    parts = []
    for t in TABLES:
        try:
            st = os.stat(f"{SF_DIR}/{t}.parquet")
            parts.append(f"{t}:{st.st_size}:{int(st.st_mtime)}")
        except OSError:
            parts.append(f"{t}:absent")
    return ",".join(parts)
_FP = _table_fp()

def oracle_df(sql):
    key = hashlib.sha256(f"{SF_DIR}|{_FP}|{sql}".encode()).hexdigest()[:24]
    pq, meta = f"{ORACLE_CACHE}/{key}.parquet", f"{ORACLE_CACHE}/{key}.json"
    if os.path.exists(pq) and os.path.exists(meta):
        try:
            import pandas as pd
            exp = pd.read_parquet(pq)
            kinds = json.load(open(meta))
            if {c: exp[c].dtype.kind for c in exp.columns} == kinds:
                return exp
            print(f"    (cache {key}: dtype drift, recomputing)", flush=True)
        except Exception as e:
            print(f"    (cache read failed: {e}; recomputing)", flush=True)
    exp = con.execute(sql).fetch_df()
    try:
        os.makedirs(ORACLE_CACHE, exist_ok=True)
        exp.to_parquet(pq + ".tmp")
        os.replace(pq + ".tmp", pq)
        with open(meta + ".tmp", "w") as f:
            json.dump({c: exp[c].dtype.kind for c in exp.columns}, f)
        os.replace(meta + ".tmp", meta)
    except Exception as e:
        print(f"    (cache write skipped: {e})", flush=True)
    return exp

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails, passes, weak = [], [], []
import glob, os
have = {os.path.basename(p) for p in glob.glob(f"{OUT}/*") if os.path.isdir(p)}
# with a subset, also restrict the COMPARE to it (so a --no-run
# re-compare over a shared outDir can target one query at a time)
if SUBSET:
    have &= set(SUBSET.split(","))

for name in sorted(have):
    print(f"... comparing {name}", flush=True)
    if name not in oracle:
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{name}/*.parquet'").fetchone()[0]
        weak.append((name, n))
        continue
    try:
        exp = oracle_df(oracle[name])
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    got = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetch_df()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"columns: oracle={list(exp.columns)} got={list(got.columns)}"))
        continue
    if len(exp) != len(got):
        fails.append((name, f"rows: oracle={len(exp)} got={len(got)}"))
        continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    bad = None
    for c in exp.columns:
        e, g = exp[c], got[c]
        # The driver hashes TYPED values: a DuckDB HUGEINT (surfaced as
        # object dtype) never hash-matches a Spark LONG even when equal.
        # Flag dtype-kind mismatches so that class of bug fails HERE too.
        if e.dtype.kind != g.dtype.kind and not (
                {e.dtype.kind, g.dtype.kind} <= {'i', 'u'}):
            bad = f"col {c}: dtype mismatch oracle={e.dtype} got={g.dtype} (driver hashes typed values)"
            break
        if e.dtype.kind == 'f' or g.dtype.kind == 'f':
            diff = (e.astype(float) - g.astype(float)).abs()
            both_nan = e.isna() & g.isna()
            mism = (~both_nan) & (e.isna() | g.isna() | (diff > 0))
            if mism.any():
                i = mism.idxmax()
                mx = diff.max()
                bad = f"col {c}: {int(mism.sum())} mismatches, maxdiff={mx}, first: oracle={e[i]} got={g[i]}"
                break
        else:
            mism = (e.astype(str) != g.astype(str))
            if mism.any():
                i = mism.idxmax()
                bad = f"col {c}: {int(mism.sum())} mismatches, first: oracle={e[i]} got={g[i]}"
                break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

print(f"\n=== PASS ({len(passes)}): {' '.join(passes)}")
print(f"=== WEAK/rows-only ({len(weak)}): {' '.join(f'{n}({c})' for n, c in weak)}")
print(f"=== FAIL ({len(fails)}):")
for n, msg in fails:
    print(f"  {n}: {msg}")
missing = set(oracle) - have
if missing:
    print(f"=== MISSING parquet for: {sorted(missing)}")
sys.exit(1 if fails else 0)
