#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (driver-side
tooling only — NOT part of the Spark engine).

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB over the
same scale-factor parquet tables, and compares against the Spark
result parquet dumped by graft.Verify: column names (sorted), row
count, and a hash over the sorted cell values — approximating the
driver's row/schema/hash match.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_digest(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
            exp = con.sql(sql)
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(got_cols) != sorted(exp_cols):
            problems.append(f"cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
        else:
            # Type parity: the driver's comparator canonicalizes DuckDB
            # HUGEINT/DECIMAL differently from BIGINT/DOUBLE, so a type
            # mismatch hash-fails on the driver even when values are
            # equal (this is exactly what sank q30..q81 in r01/r02).
            # Plain int widths canonicalize identically (TINYINT..BIGINT
            # all pass the driver's gate — proven by r02 greens), but
            # HUGEINT does not; nor do DECIMAL-vs-DOUBLE or FLOAT-vs-
            # DOUBLE, so everything else must match exactly.
            INT_CLASS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                         "UTINYINT", "USMALLINT", "UINTEGER"}
            def tclass(t):
                return "INT" if t in INT_CLASS else t
            got_types = {c: str(t) for c, t in zip(got_cols, got.types)}
            exp_types = {c: str(t) for c, t in zip(exp_cols, exp.types)}
            for c in got_types:
                if tclass(got_types[c]) != tclass(exp_types[c]):
                    problems.append(
                        f"type[{c}] spark={got_types[c]} oracle={exp_types[c]}")
        if len(got_rows) != len(exp_rows):
            problems.append(f"rows spark={len(got_rows)} oracle={len(exp_rows)}")
        if not problems and table_digest(got_rows, got_cols) != table_digest(exp_rows, exp_cols):
            problems.append("hash mismatch")
            # show first differing sorted row for debugging
            o = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            oe = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            gs = sorted(tuple(canon(r[i]) for i in o) for r in got_rows)
            es = sorted(tuple(canon(r[i]) for i in oe) for r in exp_rows)
            for a, b in zip(gs, es):
                if a != b:
                    problems.append(f"  first diff:\n    spark : {a}\n    oracle: {b}")
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
