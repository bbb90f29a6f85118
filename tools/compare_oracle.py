#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables, load the Spark parquet result, sort columns
by name + rows, and compare values exactly. Usage:
  python3 tools/compare_oracle.py <sfdir> <verify_outdir> [query ...]
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        # NaN payloads differ across engines but hash canonically; all
        # other values compare bitwise (distinguishes -0.0 from 0.0)
        if math.isnan(a) and math.isnan(b): return True
        import struct
        return struct.pack("<d", a) == struct.pack("<d", b)
    # int-vs-float (e.g. a DuckDB HUGEINT landing as float64 against a
    # Spark int64) must FAIL: the driver hashes these differently even
    # when Python's == says equal. This lenience hid l_curation_pipeline
    # for three rounds.
    if isinstance(a, float) != isinstance(b, float): return False
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Decade-lake sweeps run DuckDB beside a large Spark JVM; unbounded
    # DuckDB (default 80% of RAM) then dies with "bad allocation" on the
    # pair-heavy oracles. Cap + spill keeps the compare robust.
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    thr = os.environ.get("GRAFT_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only: continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pq.read_table(files).to_pandas()
            rel = con.sql(sql)
            # HUGEINT/unsigned oracle outputs reach pandas as float64 and
            # hash-mismatch the Spark int64 driver-side — ban them outright
            huge = [c for c, t in zip(rel.columns, [str(t) for t in rel.types])
                    if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                                  "USMALLINT", "UTINYINT")]
            if huge:
                print(f"FAIL {name}: oracle columns {huge} typed HUGEINT/unsigned "
                      f"(add CAST(... AS BIGINT))"); n_fail += 1; continue
            duck_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
        bad = 0
        for c in s.columns:
            sv, dv = s[c].tolist(), d[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if not cmp_cell(a, b):
                    if bad < 3:
                        print(f"  {name}.{c}[{i}]: spark={a!r} duck={b!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} cell mismatches  (dtypes spark={dict(s.dtypes.astype(str))})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    if n_pass + n_fail == 0:
        # a typo'd query filter must read as failure, not vacuous success
        print("== 0 queries compared (bad filter?): FAIL")
        sys.exit(2)
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
