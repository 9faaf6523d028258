"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, schema
(column names), and order-insensitive value hash.

Usage: python scripts/check_contract.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from fulltextsearch_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        norm.append("|".join(vals))
    norm.sort()
    return hashlib.md5("\n".join(norm).encode()).hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> int:
    spark = get_spark(app_name="contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):6d}  (rows-only, no oracle)")
            continue
        try:
            res = con.sql(oracles[name])
            orows = [tuple(r) for r in res.fetchall()]
            ocols = res.columns
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = value_hash(srows, scols)
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:24s} {status}  rows {len(srows)}/{len(orows)} cols={'=' if ok_cols else scols} hash={'=' if ok_hash else (sh[:8] + '!=' + oh[:8])}"
        )
        if not ok_hash and ok_rows and ok_cols:
            sset = set(value_hash([r], scols) for r in srows)
            oset = set(value_hash([r], ocols) for r in orows)
            diff_s = [r for r in srows if value_hash([r], scols) not in oset][:3]
            diff_o = [r for r in orows if value_hash([r], ocols) not in sset][:3]
            print(f"   spark-only: {diff_s}")
            print(f"   oracle-only: {diff_o}")
    # entry smoke
    edf = entrymod.entry(spark)
    print(f"entry() rows={edf.count()} schema={edf.columns}")
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
