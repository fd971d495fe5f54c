#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify` has dumped query results to OUTDIR: for each
<name>.parquet (written by Spark) and the matching SQL in
oracle_sql.json, executes the SQL in DuckDB against the same sf dir's
parquet tables and compares: column names (sorted), row count, and
value hash over rows sorted by all columns.

Usage: python3 tools/check_oracle.py SFDIR OUTDIR [query ...]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql, label):
    """Return (columns_sorted, rowcount, md5-ish hash) for a relation."""
    rel = con.sql(rel_sql)
    cols = sorted(rel.columns)
    # NULL must canonicalize distinctly from empty/missing values:
    # concat_ws would silently SKIP nulls, letting rows that differ only
    # in which column is null hash identically.
    collist = ", ".join(
        f'COALESCE(CAST("{c}" AS VARCHAR), \'\\x00NULL\')' for c in cols)
    # Canonical textual form per row, rows sorted — mirrors a
    # sort-columns-then-sort-rows-then-hash driver compare.
    q = (f'SELECT md5(string_agg(r, \'\\n\' ORDER BY r)) AS h, COUNT(*) AS n '
         f'FROM (SELECT concat_ws(\'|\', {collist}) AS r '
         f'FROM ({rel_sql}))')
    h, n = con.sql(q).fetchone()
    types = [str(t) for t in rel.types]
    return cols, n, h, dict(zip(rel.columns, types))


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            scols, sn, sh, stypes = canon(
                con, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')", "spark")
            ocols, on_, oh, otypes = canon(con, sql, "oracle")
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            try:
                con.sql("ROLLBACK")
            except Exception:
                pass
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ\n  spark : {scols}\n  oracle: {ocols}")
            failures += 1
        elif sn != on_:
            print(f"FAIL {name}: rowcount spark={sn} oracle={on_}")
            failures += 1
        elif sh != oh:
            print(f"FAIL {name}: value hash mismatch (n={sn})")
            # show a diff sample
            collist = ", ".join(f'"{c}"' for c in sorted(scols))
            con.sql(f"CREATE OR REPLACE VIEW _s AS SELECT {collist} FROM read_parquet('{outdir}/{name}/*.parquet')")
            con.sql(f"CREATE OR REPLACE VIEW _o AS SELECT {collist} FROM ({sql})")
            print("  spark-only rows:")
            print(con.sql("SELECT * FROM (SELECT * FROM _s EXCEPT ALL SELECT * FROM _o) LIMIT 5"))
            print("  oracle-only rows:")
            print(con.sql("SELECT * FROM (SELECT * FROM _o EXCEPT ALL SELECT * FROM _s) LIMIT 5"))
            failures += 1
        else:
            mism = {c: (stypes[c], otypes[c]) for c in stypes
                    if c in otypes and stypes[c] != otypes[c]}
            note = f"  [type diff: {mism}]" if mism else ""
            print(f"OK   {name} (n={sn}){note}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
