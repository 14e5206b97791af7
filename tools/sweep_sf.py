#!/usr/bin/env python3
"""Scale-sweep correctness artifact: run the DuckDB oracle compare of
tools/selfcheck.py at an arbitrary SF with a PER-QUERY oracle timeout
(a handful of deliberately quadratic DuckDB replays — the banded-graph
CTE family — are priced for sf0.01; at sf0.1 they can run for hours in
DuckDB while the Spark side finishes in seconds, so the sweep records
them as ORACLE_TIMEOUT rather than hanging).

Writes a CORRECTNESS-style JSON artifact: per query one of
  pass | fail:<reason> | oracle_timeout(<s>s)

Usage: python3 tools/sweep_sf.py <sfDir> <verifyOutDir> <out.json> [timeoutSec]
Each query's oracle runs in a fresh subprocess (DuckDB has no reliable
in-process cancel), so a timeout cannot poison later queries.
"""
import json, sys, glob, os, subprocess

WORKER = r"""
import json, sys, glob
sys.path.insert(0, "%(tooldir)s")
from selfcheck import norm, dtype_class, TABLES
import duckdb
import pandas as pd

sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    import os
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
sql = oracle[name]
files = glob.glob(f"{out_dir}/{name}/*.parquet")
if not files:
    print("fail:no spark output"); sys.exit(0)
try:
    got = norm(pd.concat([pd.read_parquet(f) for f in files]))
    exp = norm(con.execute(sql).df())
except Exception as e:
    print(f"fail:{type(e).__name__}: {e}"); sys.exit(0)
if list(got.columns) != list(exp.columns):
    print(f"fail:columns {list(got.columns)} vs {list(exp.columns)}"); sys.exit(0)
if len(got) != len(exp):
    print(f"fail:rows {len(got)} vs {len(exp)}"); sys.exit(0)
bad = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
       if dtype_class(got[c].dtype) != dtype_class(exp[c].dtype)]
if bad:
    print("fail:dtype drift " + ", ".join(f"{c}" for c, *_ in bad)); sys.exit(0)
try:
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
    print(f"pass:{len(got)}")
except AssertionError as e:
    print("fail:" + " | ".join(str(e).split("\n")[:3]))
"""


def main(sf_dir, out_dir, out_json, timeout):
    tooldir = os.path.dirname(os.path.abspath(__file__))
    worker = WORKER % {"tooldir": tooldir}
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n)))
    results, n_pass, n_fail, n_to = {}, 0, 0, 0
    for name in names:
        if name not in oracle:
            results[name] = "fail:no oracle"; n_fail += 1
            print(f"FAIL {name}: no oracle"); continue
        try:
            p = subprocess.run([sys.executable, "-c", worker,
                                sf_dir, out_dir, name],
                               capture_output=True, text=True, timeout=timeout)
            line = (p.stdout.strip().splitlines() or ["fail:empty worker output"])[-1]
            if p.returncode != 0:
                line = f"fail:worker rc={p.returncode}: " + \
                    p.stderr.strip().splitlines()[-1][:200] if p.stderr else line
        except subprocess.TimeoutExpired:
            line = f"oracle_timeout({timeout}s)"
        if line.startswith("pass:"):
            results[name] = "pass"; n_pass += 1
            print(f"PASS {name} ({line[5:]} rows)")
        elif line.startswith("oracle_timeout"):
            results[name] = line; n_to += 1
            print(f"TIMEOUT {name} (oracle > {timeout}s in DuckDB)")
        else:
            results[name] = line[:500]; n_fail += 1
            print(f"FAIL {name}: {line[5:][:300]}")
    summary = {"sf_dir": sf_dir, "n_queries": len(names), "n_pass": n_pass,
               "n_fail": n_fail, "n_oracle_timeout": n_to,
               "oracle_timeout_sec": timeout, "results": results}
    json.dump(summary, open(out_json, "w"), indent=1)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_to} oracle-timeout "
          f"of {len(names)} -> {out_json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    to = int(sys.argv[4]) if len(sys.argv) > 4 else 180
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], to))
