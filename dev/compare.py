#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run oracle_sql.json in
DuckDB over the sf tables, compare to the Verify parquet dumps."""
import duckdb, json, sys, glob, os, time, threading
import pandas as pd

# Opt-in per-oracle DuckDB budget (seconds) for the scaled local passes:
# an oracle that exceeds it is interrupted and reported as
# 'SKIP (oracle timeout)' — evidence of DuckDB reach, not a gate failure.
# The driver's gate never sets this; unset = unlimited (driver behavior).
ORACLE_TIMEOUT = float(os.environ.get('GRAFT_ORACLE_TIMEOUT_S', '0') or 0)

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
# optional cap so concurrent scaled passes don't OOM-kill each other;
# unset = DuckDB default (the driver's single-process behavior)
_mem = os.environ.get('GRAFT_ORACLE_MEM', '')
if _mem:
    con.sql(f"SET memory_limit='{_mem}'")
# An in-memory duckdb cannot spill without a temp_directory, so a
# replay whose working set exceeds the limit hard-OOMs instead of
# degrading to disk (observed on the j10_ivf_sq8 10x oracle: tiny-block
# allocation failures at 53 GB RSS). Opt-in spill dir for scaled passes.
_tmp = os.environ.get('GRAFT_ORACLE_TMP', '')
if _tmp:
    os.makedirs(_tmp, exist_ok=True)
    con.sql(f"SET temp_directory='{_tmp}'")
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    p = f'{sfdir}/{t}.parquet'
    if os.path.isdir(p):  # Spark-written dir (dev/ScaleData output)
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
# optional 3rd arg: comma-list restricting the compare (scaled-data pass
# runs the near-linear-oracle subset; the driver never passes this)
if len(sys.argv) > 3:
    only = set(sys.argv[3].split(','))
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = 0
skips = []
for name, sql in sorted(oracle.items()):
    pq_dir = f'{outdir}/{name}'
    if not os.path.isdir(pq_dir):
        print(f'{name}: MISSING spark output'); fails += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f'{pq_dir}/*.parquet')])
    except Exception as e:
        print(f'{name}: spark read FAIL {e}'); fails += 1; continue
    t0 = time.time()
    timer = None
    if ORACLE_TIMEOUT > 0:
        timer = threading.Timer(ORACLE_TIMEOUT, con.interrupt)
        try:
            timer.start()
        except RuntimeError:
            # transient system thread pressure (seen with concurrent Spark
            # passes): run this oracle un-timed rather than dying mid-pass —
            # loudly, so an unbounded run is attributable from the log
            print(f'{name}: WARNING timeout disabled — timer thread start failed')
            timer = None
    try:
        duck_df = con.sql(sql).df()
        # cancel IMMEDIATELY on success, before any compare work: a timer
        # firing after this query finished would interrupt the NEXT oracle
        # and misreport it as FAIL
        if timer: timer.cancel(); timer = None
    except Exception as e:
        if timer: timer.cancel(); timer = None
        # classify SKIP by the exception actually being the timer's
        # interrupt, NOT by elapsed wall time — a genuine oracle failure
        # (OOM, IO error, real divergence raised late) must stay a FAIL
        is_interrupt = isinstance(e, duckdb.InterruptException) \
            or 'INTERRUPT' in str(e).upper()
        if ORACLE_TIMEOUT > 0 and is_interrupt:
            print(f'{name}: SKIP (oracle timeout >{ORACLE_TIMEOUT:.0f}s — out of DuckDB reach at this scale)')
            skips.append(name); continue
        print(f'{name}: duckdb FAIL {str(e)[:200]}'); fails += 1; continue
    finally:
        if timer: timer.cancel()
    oracle_s = time.time() - t0
    s = spark_df[sorted(spark_df.columns)].sort_values(sorted(spark_df.columns)).reset_index(drop=True)
    d = duck_df[sorted(duck_df.columns)].sort_values(sorted(duck_df.columns)).reset_index(drop=True)
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        print(f'{name}: SCHEMA mismatch spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}'); fails += 1; continue
    if len(s) != len(d):
        print(f'{name}: ROWS mismatch spark={len(s)} duck={len(d)}'); fails += 1; continue
    # exact value compare (driver hashes values)
    try:
        eq = True
        for c in s.columns:
            sc, dc = s[c], d[c]
            if sc.dtype != dc.dtype:
                try:
                    dc = dc.astype(sc.dtype)
                except Exception:
                    print(f'{name}: col {c} dtype spark={sc.dtype} duck={dc.dtype}')
            if not sc.equals(dc):
                neq = (sc != dc)
                # NaN==NaN
                import numpy as np
                if sc.dtype.kind == 'f':
                    neq = ~((sc == dc) | (sc.isna() & dc.isna()))
                n_bad = int(neq.sum())
                if n_bad:
                    eq = False
                    print(f'{name}: col {c} {n_bad} diffs, e.g.\n', pd.DataFrame({'spark': sc[neq], 'duck': dc[neq]}).head(3))
        print(f'{name}: {"OK" if eq else "VALUE MISMATCH"} ({len(s)} rows, oracle {oracle_s:.1f}s)')
        if not eq: fails += 1
    except Exception as e:
        print(f'{name}: compare error {e}'); fails += 1
if skips:
    print('SKIPPED (oracle timeout):', ','.join(skips))
print('FAILS:', fails)
sys.exit(1 if fails else 0)
