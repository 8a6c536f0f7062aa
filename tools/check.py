#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL in DuckDB over the sf tables (registered as views by
bare table name, as the driver does), loads the engine's parquet dump from
Verify.scala, sorts columns by name and rows by all columns, and compares
values exactly.

Usage: python3 tools/check.py <sfdir> <verify_outdir> [query ...]
       python3 tools/check.py --lint <sfdir> <verify_outdir> [query ...]

--lint checks only the declared DuckDB output types of every oracle
(no engine dump needed beyond oracle_sql.json) — the fast audit for the
HUGEINT/DECIMAL class. NOTE: this venv runs duckdb 1.0.0 while the
reference stack pins 1.4.0 (no egress to upgrade here); the declared-type
lint is version-independent, which is why it, and not a pandas-dtype
check alone, is the gate.
"""
import sys, os, json, glob, re
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Driver-safe DuckDB output types: anything else (HUGEINT from sum(BIGINT),
# DECIMAL from sum(DECIMAL), UHUGEINT, ...) hashes differently driver-side
# than Spark's corresponding type even when every value matches — the
# round-4 failure class. The lint runs on the oracle's DECLARED relation
# types, not pandas dtypes: duckdb<=1.0's pandas conversion coerces
# HUGEINT to float64, which is exactly what masked the drift locally.
SAFE_TYPES = re.compile(
    r"^(BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE|VARCHAR|DATE"
    r"|TIMESTAMP(_NS| WITH TIME ZONE)?|INTERVAL|BLOB"
    r"|(VARCHAR|BIGINT|INTEGER|DOUBLE|FLOAT|BOOLEAN|DATE)\[\])$")
SAFE_DTYPES = {"int8", "int16", "int32", "int64", "float32", "float64",
               "bool", "object", "datetime64[ns]", "datetime64[us]"}


def lint_types(con, name, sql):
    """Return a list of 'column TYPE' strings whose DuckDB output type is
    driver-unsafe for hashing."""
    rel = con.sql(sql)
    return [f"{c} {t}" for c, t in zip(rel.columns, map(str, rel.types))
            if not SAFE_TYPES.match(str(t))]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df


def main():
    argv = sys.argv[1:]
    lint_only = argv and argv[0] == "--lint"
    if lint_only:
        argv = argv[1:]
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2:])
    def fresh_con():
        c = duckdb.connect()
        for t in TABLES:
            pth = f"{sfdir}/{t}.parquet"
            if os.path.isdir(pth):  # Spark-written tables are directories
                pth = f"{pth}/*.parquet"
            elif not os.path.exists(pth):
                continue
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pth}')")
        return c
    con = fresh_con()
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_ulp = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        if lint_only:
            try:
                bad = lint_types(con, name, sql)
            except Exception as e:
                print(f"FAIL {name}: oracle error: {e}")
                n_fail += 1
                con.close()
                con = fresh_con()
                continue
            if bad:
                print(f"FAIL {name}: driver-unsafe output type(s): "
                      + ", ".join(bad))
                n_fail += 1
            else:
                n_pass += 1
            continue
        pq = f"{outdir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: engine produced no parquet")
            n_fail += 1
            continue
        try:
            bad = lint_types(con, name, sql)
            if bad:
                print(f"FAIL {name}: driver-unsafe oracle output type(s): "
                      + ", ".join(bad)
                      + " (wrap in CAST(... AS BIGINT/DOUBLE/...))")
                n_fail += 1
                continue
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            # a poisoned connection (e.g. an OOM) must not cascade into
            # every subsequent oracle — close it, then start clean (an
            # unclosed replaced connection leaks fds/memory over a
            # 287-query run with repeated failures)
            con.close()
            con = fresh_con()
            continue
        bad_dt = [f"{c}:{want[c].dtype}" for c in want.columns
                  if str(want[c].dtype) not in SAFE_DTYPES]
        if bad_dt:
            print(f"FAIL {name}: driver-unsafe pandas dtype(s): "
                  + ", ".join(bad_dt))
            n_fail += 1
            continue
        # the oracle connection (views over the sf tables) reads the
        # engine dump too — no throwaway per-result connection to leak
        got = con.execute(
            f"SELECT * FROM read_parquet('{pq}/*.parquet')").df()
        w, g = norm(want), norm(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns want={list(w.columns)} got={list(g.columns)}")
            n_fail += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
            n_fail += 1
            continue
        # exact compare (NaN == NaN); report first few diffs.
        # ULP-FLAKE CLASS (Q.scaledLong contract, QueryPack.scala): scaled
        # BIGINT columns derived through transcendentals (log/sqrt/pow/...)
        # rely on JVM Math vs DuckDB libm both being ~1-ulp-correct, not
        # bit-identical — a true value within ~1 ulp of a .5*10^-n rounding
        # boundary can flip the last scaled digit between engines. Such a
        # mismatch (|want-got| == 1 on an integer column, in a query whose
        # oracle routes through a transcendental) is mechanically classified
        # "ULP", counted separately, and does NOT fail the gate — any other
        # mismatch stays a hard FAIL.
        transcendental = bool(re.search(
            r"\b(log|log10|log2|ln|sqrt|pow|power|exp)\s*\(", sql, re.I))
        diffs, ulp_only = [], []
        for c in w.columns:
            a, b = w[c], g[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if not neq.any():
                continue
            is_int = str(a.dtype).startswith("int") and str(b.dtype).startswith("int")
            if (transcendental and is_int
                    and (a[neq] - b[neq]).abs().max() <= 1):
                ulp_only.append(f"col {c}: {int(neq.sum())} one-last-digit diffs")
                continue
            i = neq.idxmax()
            diffs.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: "
                         f"want={a[i]!r} got={b[i]!r}")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]))
            n_fail += 1
        elif ulp_only:
            print(f"ULP  {name}: " + "; ".join(ulp_only)
                  + " (transcendental scaled-BIGINT flake, not a regression"
                  " — see Q.scaledLong contract)")
            n_ulp += 1
        else:
            print(f"PASS {name} ({len(w)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail"
          + (f", {n_ulp} ulp-flake" if n_ulp else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
