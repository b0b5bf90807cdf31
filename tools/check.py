#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate (dev tool only,
not part of the shipped library). Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views named
after the tables in <sfDir>, and compares column names (sorted), dtypes, row
counts, and cell values (exact; row order as produced AND row-sorted).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    # date32 (pyarrow) vs DATE (duckdb fetchdf → datetime64) — the driver
    # hash-matches these (r02: q04/q08/q12/q19/q20 green), so canonicalize
    # date-like columns to datetime64 on both sides. Decimal stays strict.
    import datetime
    for c in df.columns:
        if df[c].dtype == object and len(df) and all(
                v is None or (isinstance(v, datetime.date)
                              and not isinstance(v, datetime.datetime))
                for v in df[c]):
            df[c] = pd.to_datetime(df[c])
    return df


def cmp_frames(a, b):
    """Return (ok, msg). Exact value compare on sorted-by-name columns."""
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    a, b = norm(a), norm(b)
    if len(a) != len(b):
        return False, f"row count differs: spark={len(a)} oracle={len(b)}"
    dtype_notes = []
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            dtype_notes.append(f"{c}: spark={a[c].dtype} oracle={b[c].dtype}")
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if (x is None) != (y is None):
                return False, f"null mismatch col={c} row={i}: spark={x!r} oracle={y!r}"
            if isinstance(x, float) and isinstance(y, float):
                if x != y and not (pd.isna(x) and pd.isna(y)):
                    return False, f"value mismatch col={c} row={i}: spark={x!r} oracle={y!r}"
            elif str(x) != str(y):
                return False, f"value mismatch col={c} row={i}: spark={x!r} oracle={y!r}"
    note = ("; dtypes: " + ", ".join(dtype_notes)) if dtype_notes else ""
    return True, "OK" + note


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_fail = 0
    only = sys.argv[3:] or None
    for name in sorted(oracles):
        if only and name not in only:
            continue
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            # Spark side via pyarrow/pandas, NOT duckdb fetchdf: fetchdf
            # coerces DECIMAL->float64 on both sides and can report PASS
            # where the driver's stricter compare reports a hash FAIL.
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in sorted(res_glob)],
                ignore_index=True)
            oracle_df = con.execute(oracles[name]).fetchdf()
            ok, msg = cmp_frames(spark_df, oracle_df)
        except Exception as e:
            ok, msg = False, f"exception: {e}"
        print(("PASS" if ok else "FAIL") + f" {name}: {msg}")
        n_ok += ok
        n_fail += not ok
    print(f"\n{n_ok} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
