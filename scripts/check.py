#!/usr/bin/env python3
"""Local oracle check mimicking the driver: run Verify's parquet output
against DuckDB executing oracle_sql.json on the same sf tables, compare
values with columns sorted by name. Usage:
  python3 scripts/check.py <sfDir> <outDir> [name...]
"""
import sys, json, glob, os, threading
import duckdb

# Per-query budget: one runaway oracle must report FAIL, not hang the
# sweep (the r11 lesson — q422's non-MATERIALIZED CTE chain zeroed the
# round's correctness artifact by hanging the sorted sweep).
TIMEOUT_SEC = float(os.environ.get("CHECK_TIMEOUT_SEC", "120"))

def timed_df(con, sql):
    """Run sql -> pandas df, interrupting DuckDB after TIMEOUT_SEC.

    The callback is guarded by a done flag: an unguarded timer firing
    in the gap between con.sql() returning and timer.cancel() would
    interrupt with no query active, which (DuckDB-version-dependent)
    can latch and abort the NEXT query — turning a slow-but-passing
    entry into a spurious FAIL on the following one.
    """
    done = threading.Event()

    def maybe_interrupt():
        if not done.is_set():
            con.interrupt()

    timer = threading.Timer(TIMEOUT_SEC, maybe_interrupt)
    timer.start()
    try:
        return con.sql(sql).df()
    finally:
        done.set()
        timer.cancel()

def lint_oracle_types(con, oracle):
    """Static HUGEINT lint over EVERY oracle, run regardless of which
    queries this invocation compares (the r15 lesson made durable):
    DuckDB's sum() over BIGINT returns HUGEINT, whose pandas rendering
    is float64, so an uncast aggregate in a final SELECT hash-diverges
    from Spark's BIGINT at the driver while rows/values match
    (q457/q463/q495, rounds 13-15). DESCRIBE binds the output schema
    WITHOUT executing, so this sweeps all ~545 oracles in seconds and
    catches a new uncast oracle even when the local check run is
    restricted to other queries. Returns (offenders, describe_failures):
    a DESCRIBE that itself errors is an ENVIRONMENT/SQL problem (table
    missing from the sf dir, syntax), not a type-lint finding — folding
    it into the offender list made every run fail with a misleading
    "uncast 128-bit" message, so it is reported as its own class.
    """
    # Self-test canary: a deliberately uncast sum() MUST be flagged,
    # else the lint itself is broken and the whole check aborts.
    canary = "SELECT sum(x) AS s FROM (VALUES (CAST(1 AS BIGINT))) t(x)"
    def final_types(sql):
        return [(r[0], r[1]) for r in
                con.sql(f"DESCRIBE {sql}").fetchall()]
    assert any("HUGEINT" in t for _, t in final_types(canary)), \
        "lint self-test failed: canary HUGEINT not detected"
    offenders = []
    describe_failures = []
    for name, sql in sorted(oracle.items()):
        try:
            bad = [f"{c}:{t}" for c, t in final_types(sql)
                   if "HUGEINT" in t.upper()]
        except Exception as e:
            print(f"LINT-DESCRIBE {name}: oracle does not bind: {e}")
            describe_failures.append(name)
            continue
        if bad:
            print(f"LINT {name}: uncast 128-bit final column(s) "
                  f"{'; '.join(bad)} — driver hash would mismatch "
                  "(cast to BIGINT/DOUBLE in the outermost SELECT)")
            offenders.append(name)
    return offenders, describe_failures

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    failures = []
    lint_bad, lint_describe = lint_oracle_types(con, oracle)
    if lint_bad:
        failures.extend(f"lint:{n}" for n in lint_bad)
        n_bad += len(lint_bad)
    if lint_describe:
        failures.extend(f"lint-describe:{n}" for n in lint_describe)
        n_bad += len(lint_describe)
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            failures.append(name)
            n_bad += 1
            continue
        try:
            got = timed_df(
                con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            want = timed_df(con, sql)
        except duckdb.InterruptException:
            print(f"FAIL {name}: oracle timeout after {TIMEOUT_SEC}s")
            failures.append(name)
            n_bad += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures.append(name)
            n_bad += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures.append(name)
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures.append(name)
            n_bad += 1
            continue
        bad_cols = []
        import pandas as pd
        for c in got.columns:
            a = got[c].reset_index(drop=True)
            b = want[c].reset_index(drop=True)
            # Dtype-CLASS gate (the r14 lesson): DuckDB renders HUGEINT
            # result columns as pandas float64, so an uncast HUGEINT
            # oracle column stringifies as "123.0" against Spark's
            # BIGINT "123" in the driver's hash compare — while the
            # numeric == below passes. Fail int-vs-float and
            # numeric-vs-object mismatches here so that class can never
            # go green locally again (q457/q463/q495, rounds 13-14).
            a_f = pd.api.types.is_float_dtype(a)
            b_f = pd.api.types.is_float_dtype(b)
            a_o = a.dtype == object
            b_o = b.dtype == object
            if a_f != b_f or a_o != b_o:
                bad_cols.append(
                    f"{c}: dtype class {a.dtype} != {b.dtype} "
                    "(driver hash would mismatch)")
                continue
            try:
                both_null = a.isna() & b.isna()
                eq = (a == b) | both_null
                if not eq.all():
                    i = int((~eq).idxmax())
                    bad_cols.append(f"{c}[row {i}]: {a.iloc[i]!r} != {b.iloc[i]!r}")
            except Exception as e:
                bad_cols.append(f"{c}: compare error {e}")
        if bad_cols:
            print(f"FAIL {name}: {'; '.join(bad_cols[:4])}")
            failures.append(name)
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows, {len(got.columns)} cols)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    # forensic twin of Verify's verify_summary.json: if a round's
    # correctness artifact ever zeroes again, the sweep's own record
    # says what it saw (and which queries failed) in one read
    try:
        with open(f"{out_dir}/check_summary.json", "w") as f:
            json.dump({"n_ok": n_ok, "n_bad": n_bad,
                       "timeout_sec": TIMEOUT_SEC,
                       # the r13 lesson: three hash-only misses were a
                       # DuckDB-VERSION divergence invisible without
                       # knowing which engine version checked the round
                       "duckdb_version": duckdb.__version__,
                       "failures": failures}, f)
    except OSError:
        pass
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
