#!/usr/bin/env python3
"""Oracle-SQL dtype lint: run every oracle query in DuckDB (schema only, no
value comparison) and reject result columns whose type cannot round-trip the
driver's dtype-sensitive hash.

Catches the bug class that bit counts in round 2 and sel_token_pack in round
4: DuckDB widens integer aggregates (SUM(BIGINT) -> HUGEINT, windowed or not),
and an uncast HUGEINT/INT128 column arrives in pandas as float64/object while
Spark emits int64 -- value-equal, hash-mismatched.

Two checks per oracle:
  - absolute: no HUGEINT / UHUGEINT result column (cast to BIGINT in the SQL)
  - relative: the DuckDB result type KIND (int / float / string / ...) must
    match the Spark dump's parquet type kind for the same column -- this is
    the actual driver contract, caught at schema level without needing the
    values to be ready.

Usage: python3 tools/lint_oracle.py <sfDir> <verifyOutDir>
  (reads <verifyOutDir>/oracle_sql.json + per-query parquet dumped by
   graft.Verify)
"""
import glob
import json
import sys

import duckdb

INT128 = {"HUGEINT", "UHUGEINT"}


def kind(duck_type):
    t = str(duck_type).upper()
    if t in INT128 or t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL") or t.startswith("DECIMAL"):
        return "float"
    if t in ("VARCHAR", "CHAR", "TEXT", "STRING", "BLOB"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    return t  # lists/structs/dates: compare verbatim


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    n_bad = 0
    for name in sorted(oracles):
        try:
            rel = con.sql(oracles[name])
            otypes = dict(zip(rel.columns, [str(t).upper() for t in rel.types]))
        except Exception as e:
            print(f"ORAFAIL  {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        for c, t in otypes.items():
            if t in INT128:
                print(f"HUGEINT  {name}: column {c} is {t} -- CAST(... AS BIGINT)")
                n_bad += 1
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            continue  # dump missing; check.py reports that
        srel = con.sql("SELECT * FROM read_parquet(['" + files[0] + "'])")
        stypes = dict(zip(srel.columns, [str(t).upper() for t in srel.types]))
        for c in otypes:
            if c in stypes and kind(otypes[c]) != kind(stypes[c]):
                print(f"KIND     {name}: column {c} spark={stypes[c]} "
                      f"oracle={otypes[c]}")
                n_bad += 1
    print(f"\nlint: {len(oracles)} oracles, {n_bad} findings")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
