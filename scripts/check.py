#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's t2 check.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
corresponding SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir tables registered as views, and compares: schema (column names),
row count, and name-sorted-column / row-sorted values.

Driver-side tooling only (duckdb/pandas/pyarrow) — not a library dependency.
"""
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_canon(t) -> str:
    """Arrow type → canonical label. STRICT about decimal-vs-int/float: the
    driver's hash fails DuckDB HUGEINT (→ decimal128(38,0)) against Spark
    int64 (r02 evidence), so those must fail here too. Integer WIDTHS fold:
    the driver passed ann_* with spark int32 rank vs oracle int64 in r02.
    """
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_canon(t.value_type)}>"
    return str(t)


def types_match(name: str, spark_tbl: pa.Table, oracle_tbl: pa.Table) -> bool:
    ok = True
    s_types = {f.name: type_canon(f.type) for f in spark_tbl.schema}
    o_types = {f.name: type_canon(f.type) for f in oracle_tbl.schema}
    for c in sorted(set(s_types) & set(o_types)):
        if s_types[c] != o_types[c]:
            print(f"[{name}] TYPE mismatch col {c}: spark={s_types[c]} "
                  f"oracle={o_types[c]}")
            ok = False
    return ok


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> bool:
    ok = True
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        print(f"[{name}] SCHEMA mismatch: spark={sorted(spark_df.columns)} "
              f"oracle={sorted(oracle_df.columns)}")
        return False
    if len(spark_df) != len(oracle_df):
        print(f"[{name}] ROWS mismatch: spark={len(spark_df)} oracle={len(oracle_df)}")
        ok = False
    s, o = canon(spark_df), canon(oracle_df)
    if ok:
        for c in s.columns:
            sv, ov = s[c], o[c]
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                sv, ov = sv.astype(float), ov.astype(float)
                bad = ~((sv == ov) | (sv.isna() & ov.isna()))
                # report exact mismatches with magnitude for debugging
                if bad.any():
                    diffs = (sv[bad] - ov[bad]).abs()
                    print(f"[{name}] col {c}: {bad.sum()} float mismatches, "
                          f"max |diff|={diffs.max():.3e} "
                          f"first: spark={sv[bad].iloc[0]!r} oracle={ov[bad].iloc[0]!r}")
                    ok = False
            else:
                sv, ov = sv.astype(str), ov.astype(str)
                bad = sv != ov
                if bad.any():
                    print(f"[{name}] col {c}: {bad.sum()} mismatches, "
                          f"first: spark={sv[bad].iloc[0]!r} oracle={ov[bad].iloc[0]!r}")
                    ok = False
    return ok


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"[{name}] spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            oracle_tbl = con.execute(sql).arrow()
        except Exception as e:
            print(f"[{name}] oracle SQL failed: {e}")
            n_fail += 1
            continue
        t_ok = types_match(name, spark_tbl, oracle_tbl)
        v_ok = compare(name, spark_tbl.to_pandas(), oracle_tbl.to_pandas())
        print(f"[{name}] {'OK' if t_ok and v_ok else 'FAIL'} "
              f"({spark_tbl.num_rows} rows)")
        if t_ok and v_ok:
            n_ok += 1
        else:
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
