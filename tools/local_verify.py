#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/local_verify.py OUTDIR SFDIR [only,names]
  OUTDIR: dir written by `sbt "runMain graft.Verify SFDIR OUTDIR"`
  SFDIR:  /root/testdata/sf0.01 (tables registered as views by stem name)

Compares per query: row count, sorted column-name list, and a value hash
over rows with columns sorted by name (floats rounded to 9 significant
decimals, same spirit as the driver).
"""
import sys, json, glob, os, hashlib
import duckdb

def canon(v):
    if v is None:
        # the driver's pandas to_csv writes NULL and '' identically
        # (empty field); mirror that so e.g. a NULL-vs-'' skew on an
        # array_to_string of an empty list matches the driver's verdict
        return ""
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_hash(cols, rows):
    # rows sorted by their canonical string: the hash is row-order
    # insensitive, so it does not depend on every query ending in a
    # total-order ORDER BY or on parquet glob read order
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for line in sorted("\x01".join(canon(row[i]) for i in order)
                       for row in rows):
        h.update((line + "\x02").encode())
    return h.hexdigest()

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    # spill to /tmp, never the cwd (a runaway oracle once left 54 GB of
    # duckdb_temp_storage in the repo); cap memory below the box's RAM
    con.execute("SET temp_directory='/tmp/graft-duckdb-spill'")
    con.execute("SET memory_limit='48GB'")
    con.execute("SET max_temp_directory_size='60GB'")
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        stem = os.path.basename(p)[:-len(".parquet")]
        # single-file tables (testdata) and Spark directory tables
        # (ScaleOracle's sf1.0 replicas) both register by stem
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {stem} AS SELECT * FROM '{src}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = os.path.join(outdir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{res_dir}/*.parquet'")
            scols = [c for c in spark_rel.columns]
            srows = spark_rel.fetchall()
            orel = con.sql(sql)
            ocols = [c for c in orel.columns]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = ok_schema and table_hash(scols, srows) == table_hash(ocols, orows)
        if ok_rows and ok_schema and ok_hash:
            n_pass += 1
            print(f"PASS {name} ({len(srows)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(srows)}/{len(orows)} "
                  f"schema_ok={ok_schema} hash_ok={ok_hash}")
            if not ok_schema:
                print(f"  spark cols:  {sorted(scols)}")
                print(f"  oracle cols: {sorted(ocols)}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
