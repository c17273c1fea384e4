#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query dumped by graft.Verify into <outDir>/<name>/ (parquet) with
<outDir>/oracle_sql.json, runs the oracle SQL in DuckDB over the same
testdata tables, then compares row count, schema (column names), and a
hash over (column-name-sorted, row-sorted) values.
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def hash_df(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col]:
            h.update(repr(v).encode())
        h.update(b"|")
    return h.hexdigest()[:16]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    fails = 0
    for name in names:
        spark_df = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(spark_df)} "
                  f"(rows-only check) {'OK' if len(spark_df) > 0 else 'EMPTY!'}")
            if len(spark_df) == 0:
                fails += 1
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE-SQL-ERROR {e}")
            fails += 1
            continue
        s, o = canon(spark_df), canon(oracle_df)
        schema_ok = list(s.columns) == list(o.columns)
        rows_ok = len(s) == len(o)
        # dtype comparison: duckdb→pandas may map differently than
        # spark-parquet→pandas (e.g. int32 vs int64); compare kind+exactness
        types = {c: (str(s[c].dtype), str(o[c].dtype)) for c in s.columns
                 if schema_ok and str(s[c].dtype) != str(o[c].dtype)}
        hash_ok = schema_ok and rows_ok and hash_df(s) == hash_df(o)
        status = "OK" if (schema_ok and rows_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            fails += 1
        extra = ""
        if not schema_ok:
            extra = f" spark_cols={list(s.columns)} oracle_cols={list(o.columns)}"
        elif not rows_ok:
            extra = f" spark_rows={len(s)} oracle_rows={len(o)}"
        elif not hash_ok:
            # find first differing cell
            for c in s.columns:
                neq = s[c].astype(str) != o[c].astype(str)
                if neq.any():
                    i = neq.idxmax()
                    extra = (f" first-diff col={c} row={i} "
                             f"spark={s[c][i]!r} oracle={o[c][i]!r}")
                    break
        if types:
            extra += f" dtype-diffs={types}"
        print(f"  {name}: {status} rows={len(s)}{extra}")
    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'} "
          f"({len(names)} queries)")
    return fails


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
