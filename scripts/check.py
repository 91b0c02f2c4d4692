#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB-oracle compare.

NOT part of the Scala library (driver-side python only). Usage:

    python3 scripts/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
each testdata parquet as a DuckDB view, runs every oracle, and compares it
exactly (EXCEPT ALL both ways inside DuckDB, columns aligned by sorted
name) against the Spark-written parquet at <verifyOutDir>/<name>/.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            orc = con.execute(sql).fetch_arrow_table()
            spk = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).fetch_arrow_table()
            ocols, scols = sorted(orc.column_names), sorted(spk.column_names)
            if ocols != scols:
                print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
                failures += 1
                continue
            cols = ", ".join(f'"{c}"' for c in ocols)
            con.register("orc_t", orc)
            con.register("spk_t", spk)
            diff = con.execute(
                f"SELECT count(*) FROM ("
                f"(SELECT {cols} FROM orc_t EXCEPT ALL SELECT {cols} FROM spk_t)"
                f" UNION ALL "
                f"(SELECT {cols} FROM spk_t EXCEPT ALL SELECT {cols} FROM orc_t))"
            ).fetchone()[0]
            if diff or orc.num_rows != spk.num_rows:
                print(f"FAIL {name}: rows oracle={orc.num_rows} "
                      f"spark={spk.num_rows} diff_rows={diff}")
                ex = con.execute(
                    f"SELECT {cols} FROM orc_t EXCEPT ALL "
                    f"SELECT {cols} FROM spk_t LIMIT 3").fetchall()
                ex2 = con.execute(
                    f"SELECT {cols} FROM spk_t EXCEPT ALL "
                    f"SELECT {cols} FROM orc_t LIMIT 3").fetchall()
                print(f"  oracle-only: {ex}\n  spark-only:  {ex2}")
                failures += 1
            else:
                print(f"OK   {name}: {orc.num_rows} rows")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            failures += 1
    print(f"{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
