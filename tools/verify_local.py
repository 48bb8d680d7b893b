#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the oracle SQL
from <verifyOutDir>/oracle_sql.json in DuckDB (with each testdata table
registered as a view), sorts columns by name, sorts rows, and compares
row-count / schema / value hash. NOT part of the shipped library — dev
feedback loop only.
"""
import sys, json, glob, hashlib
import duckdb
import numpy as np
import pyarrow.parquet as pq

def norm_cell(v):
    # Mimic the driver: both sides are fetched via pandas (.df()), so DuckDB
    # HUGEINT becomes float64 ("19428.0") while Spark BIGINT stays int64
    # ("19428") — a real mismatch the driver sees. Do NOT normalize types.
    if v is None:
        return "NULL"
    if isinstance(v, np.ndarray):
        return "[" + ",".join(norm_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if v != v:  # NaN = SQL NULL through pandas
            return "NULL"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def fetch_pandas(rel):
    df = rel.df()
    return [tuple(row) for row in df.itertuples(index=False, name=None)]

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            # Fetch the SPARK side via pyarrow, exactly as the driver does —
            # reading it through DuckDB would degrade parquet DECIMAL to
            # float64 on both sides and mask the Decimal-vs-float rendering
            # seam the driver sees (round-9 q198: values identical, hash red
            # here only; 204/204 locally through the old DuckDB path).
            stbl = pq.read_table(files)
            scols = [c.lower() for c in stbl.column_names]
            # date_as_object=False: DATE -> datetime64, matching DuckDB's
            # pandas rendering (driver evidence: every DATE-columned gate,
            # e.g. q01, hash-matches in CORRECTNESS_r09 — so the driver's
            # fetch normalizes dates; only DECIMAL demonstrably diverges).
            sdf = stbl.to_pandas(date_as_object=False)
            srows = [tuple(row) for row in sdf.itertuples(index=False, name=None)]
            duck_rel = con.sql(sql)
            dcols = [c.lower() for c in duck_rel.columns]
            drows = fetch_pandas(duck_rel)
            # The DRIVER's harness sorts rows with pandas sort_values, which
            # crashes on array-typed cells (round-5 q57/q60/q65:
            # "unhashable type: numpy.ndarray"). Fail here too so the
            # divergence is caught at dev time: no array columns may reach
            # the gate boundary.
            # Per column, scan until the first NON-NULL cell (an array
            # column whose first row is NULL must still be rejected; a
            # full rows x cols walk would be wasteful on big gates).
            def first_non_null(rows, i):
                for r in rows:
                    v = r[i]
                    if v is not None and not (isinstance(v, float) and v != v):
                        return v
                return None
            arr_cols = [c for rows, cols in ((srows, scols), (drows, dcols))
                        for i, c in enumerate(cols)
                        if isinstance(first_non_null(rows, i),
                                      (np.ndarray, list, tuple))]
            if arr_cols:
                print(f"FAIL {name}: array-typed gate column(s) "
                      f"{sorted(set(arr_cols))} — driver's pandas hasher "
                      "cannot sort these; project through array_join/to_json")
                n_fail += 1
                continue
            if sorted(scols) != sorted(dcols):
                print(f"FAIL {name}: schema spark={sorted(scols)} duck={sorted(dcols)}")
                n_fail += 1; continue
            if len(srows) != len(drows):
                print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
                n_fail += 1; continue
            sh, dh = table_hash(srows, scols), table_hash(drows, dcols)
            if sh != dh:
                print(f"FAIL {name}: hash mismatch ({len(srows)} rows)")
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = sorted("|".join(norm_cell(r[i]) for i in so) for r in srows)
                dset = sorted("|".join(norm_cell(r[i]) for i in do) for r in drows)
                shown = 0
                for a, b in zip(sset, dset):
                    if a != b and shown < 3:
                        print(f"  spark: {a[:200]}\n  duck : {b[:200]}")
                        shown += 1
                n_fail += 1
            else:
                print(f"PASS {name} ({len(srows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__} {str(e)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
