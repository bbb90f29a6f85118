#!/usr/bin/env python3
"""DuckDB-side mirror of graft.Forensics: render the oracle result of
each query in the SAME canonical form Verify dumps to
<outdir>_forensics/<name>.json (sibling dir of the verify outdir), and diff the hash decompositions.
On a driver hash mismatch this localizes the divergence to a column
(per-column md5) and a row set (per-row md5) without raw-data access
to the other environment.

Usage: python3 tools/forensics.py <sfdir> <verify_outdir> [query ...]
Exit 0 = every compared query's total_md5 matches; 1 otherwise.

Cell canon (lock-step with Forensics.cell): null → '∅'; doubles as
raw IEEE-754 bits hex (NaN collapsed to the canonical quiet NaN);
's:'-tagged strings; 'b:'-tagged hex bytes; dates as epoch days;
timestamps as epoch micros; integral types bare decimal; containers
recursive. Hashes: md5 over UTF-8 with utf8-length-prefixed cells.
"""
import sys, json, struct, math, hashlib, datetime, decimal
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
EPOCH_DAY = datetime.date(1970, 1, 1).toordinal()


def cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        bits = 0x7ff8000000000000 if math.isnan(v) else \
            struct.unpack("<Q", struct.pack("<d", v))[0]
        return f"d:{bits:016x}"
    if isinstance(v, str):
        return "s:" + v
    if isinstance(v, (bytes, bytearray)):
        return "b:" + bytes(v).hex()
    if isinstance(v, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        # exact integer micros: float total_seconds() accumulates ~0.4µs
        # of rounding for 2024-era datetimes and breaks outright past ~2100
        return "ts:" + str((v - epoch) // datetime.timedelta(microseconds=1))
    if isinstance(v, datetime.date):
        return "dt:" + str(v.toordinal() - EPOCH_DAY)
    if isinstance(v, decimal.Decimal):
        # lock-step with Forensics.cell's BigDecimal branch:
        # 'dec:' + stripTrailingZeros.toPlainString
        return "dec:" + format(v.normalize(), "f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(lp(cell(x)) for x in v) + "]"
    if isinstance(v, dict):
        # DuckDB STRUCT arrives as a dict in declared-field order →
        # render positionally like Forensics' Row branch. (A DuckDB MAP
        # also arrives as a dict and would need the sorted '{k->v}'
        # form — no oracle query outputs maps; compare_oracle remains
        # the gate if one ever does.)
        return "(" + ",".join(lp(cell(x)) for x in v.values()) + ")"
    if isinstance(v, int):
        return str(v)
    return "?:" + str(v)


def lp(s):
    return str(len(s.encode())) + ":" + s


def md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def oracle_report(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    grid = [[cell(row[i]) for i in order] for row in cur.fetchall()]
    # elementwise-lexicographic, like Forensics.report; Python's str sort
    # is code-point order == UTF-8 byte order == Forensics' utf8Ordering
    grid.sort()
    # per-column md5 over INDEPENDENTLY sorted values (lock-step with
    # Forensics: one bad column must not poison the others' hashes)
    cols = {names[i]: {"md5": md5("\n".join(sorted(lp(r[j]) for r in grid)))}
            for j, i in enumerate(order)}
    row_md5 = [md5("\n".join(lp(c) for c in r)) for r in grid]
    return {"nrows": len(grid), "total_md5": md5("\n".join(row_md5)),
            "columns": cols, "row_md5": row_md5}


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark = json.load(open(f"{outdir.rstrip(chr(47))}_forensics/{name}.json"))
        except FileNotFoundError:
            print(f"SKIP {name}: no spark forensics file")
            continue
        try:
            duck = oracle_report(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if spark["total_md5"] == duck["total_md5"]:
            print(f"PASS {name} (total_md5 {spark['total_md5'][:12]}…, {spark['nrows']} rows)")
            n_pass += 1
            continue
        n_fail += 1
        print(f"FAIL {name}: total_md5 spark={spark['total_md5']} duck={duck['total_md5']}")
        if spark["nrows"] != duck["nrows"]:
            print(f"  nrows: spark={spark['nrows']} duck={duck['nrows']}")
        bad_cols = [c for c in spark["columns"]
                    if c not in duck["columns"]
                    or spark["columns"][c]["md5"] != duck["columns"][c]["md5"]]
        print(f"  diverging columns: {bad_cols or '(none — row order/count only)'}")
        sr, dr = spark["row_md5"], duck["row_md5"]
        bad_rows = [i for i in range(min(len(sr), len(dr))) if sr[i] != dr[i]]
        print(f"  diverging sorted-row indexes: {bad_rows[:10]}"
              + (f" (+{len(bad_rows)-10} more)" if len(bad_rows) > 10 else ""))
    if n_pass + n_fail == 0:
        print("== 0 queries compared (bad filter?): FAIL")
        sys.exit(2)
    print(f"== forensics: {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
