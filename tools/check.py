#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (Spark output), runs the
matching oracle SQL from oracle_sql.json in DuckDB over <sf_dir>'s
tables, and compares: column names (sorted), row counts, and values
(rows sorted by all columns, NaN-safe, float tolerance 1e-9 relative).
Exit 0 iff all queries match.
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # The driver sorts RAW pandas values: nested structs/arrays (dicts,
    # ndarrays, lists) are unsortable there and the query errs. Do NOT
    # stringify object columns first (round-5 false green) — replicate the
    # driver and fail loudly with a hint instead.
    df = df.reindex(sorted(df.columns), axis=1)
    try:
        return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    except TypeError as e:
        raise TypeError(
            f"{e} — output has a nested/non-scalar column the driver cannot "
            "sort; serialize it (to_json / concat_ws) on BOTH engines") from e


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
            return True
        return False
    return a == b


def compare(name, spark_df, oracle_df):
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        return f"SCHEMA mismatch: spark={sc} oracle={oc}"
    if len(spark_df) != len(oracle_df):
        return f"ROWCOUNT mismatch: spark={len(spark_df)} oracle={len(oracle_df)}"
    a, b = canon(spark_df), canon(oracle_df)
    # The driver hashes stringified values, so int64 5 vs float64 5.0 is a
    # mismatch there even though Python 5 == 5.0. Replicate by comparing
    # dtype kinds (int-family vs float vs other).
    if len(a) > 0:
        for col in a.columns:
            ka = a[col].dtype.kind
            kb = b[col].dtype.kind
            fam = lambda k: "i" if k in "iu" else ("f" if k == "f" else "o")
            if fam(ka) != fam(kb):
                return (f"DTYPE mismatch col={col}: spark={a[col].dtype} "
                        f"oracle={b[col].dtype} (driver hashes these differently)")
    def null_scalar(v):
        # NaN/NaT/None -> None; leave arrays/lists/strings alone (pd.isna
        # on those is elementwise or False).
        if v is None:
            return None
        if not hasattr(v, "__len__") and pd.isna(v):
            return None
        return v

    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x, y = null_scalar(x), null_scalar(y)
            if not values_equal(x, y):
                return f"VALUE mismatch col={col} row={i}: spark={x!r} oracle={y!r}"
    return None


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle_sql = json.load(f)

    results = {}
    names = [d for d in sorted(os.listdir(out_dir))
             if (only is None or d in only)
             if os.path.isdir(os.path.join(out_dir, d))]
    for name in names:
        try:
            spark_df = pd.read_parquet(os.path.join(out_dir, name))
        except Exception as e:
            results[name] = f"SPARK READ FAIL: {e}"
            continue
        if name not in oracle_sql:
            results[name] = f"rows-only: {len(spark_df)} rows" + ("" if len(spark_df) > 0 else " (EMPTY!)")
            continue
        try:
            oracle_df = con.execute(oracle_sql[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE SQL FAIL: {str(e).splitlines()[0][:200]}"
            continue
        try:
            err = compare(name, spark_df, oracle_df)
        except TypeError as e:  # the driver reports these as `err` rows
            err = f"UNSORTABLE: {e}"
        results[name] = err or "OK"

    # Verify records every query that threw during the dump in
    # errors.json — surface those as explicit FAIL rows (with the actual
    # exception) instead of the generic "no spark output".
    errors_path = os.path.join(out_dir, "errors.json")
    dump_errors = {}
    if os.path.exists(errors_path):
        with open(errors_path) as f:
            dump_errors = json.load(f)
    for name, msg in sorted(dump_errors.items()):
        if (only is None or name in only) and name not in results:
            results[name] = f"DUMP FAIL: {msg}"

    missing = [n for n in oracle_sql if n not in names and n not in dump_errors
               and (only is None or n in only)]
    nfail = 0
    for name, res in sorted(results.items()):
        ok = res == "OK" or res.startswith("rows-only") and "EMPTY" not in res
        if not ok:
            nfail += 1
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {res}")
    for n in missing:
        print(f"FAIL  {n}: oracle declared but no spark output")
        nfail += 1
    print(f"\n{len(results) - nfail}/{len(results)} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
