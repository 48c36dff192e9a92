"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, when an ``oracle_sql()`` twin
exists, the same SQL on DuckDB over the sf parquet tables; compares row count,
column names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values stringified). Usage:

    python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ch_pdf_parse_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(_norm(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for row in canon:
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()[:16]


def _norm(v) -> str:
    if v is None:
        return "\x00"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-queries", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in sqls:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            res = con.execute(sqls[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        ok_cnt = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_hash = ok_cols and value_hash(scols, srows) == value_hash(dcols, drows)
        status = "OK   " if (ok_cnt and ok_cols and ok_hash) else "FAIL "
        print(f"{status} {name}: rows {len(srows)}/{len(drows)} cols={ok_cols} "
              f"hash={ok_hash} [{time.time() - t0:.1f}s]")
        if status.startswith("FAIL"):
            failed.append(name)
            if not ok_cols:
                print(f"   spark cols: {sorted(scols)}\n   duck  cols: {sorted(dcols)}")
            elif not ok_hash and srows and drows:
                # compare in name-sorted column order (what value_hash uses),
                # so a cross-engine column-order difference can't misreport
                # the diverging column
                sorder = sorted(range(len(scols)), key=lambda i: scols[i])
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sd = sorted(tuple(_norm(r[i]) for i in sorder) for r in srows)
                dd = sorted(tuple(_norm(r[i]) for i in dorder) for r in drows)
                diff = next((i for i, (a, b) in enumerate(zip(sd, dd))
                             if a != b), None)
                if diff is None:
                    # no zipped pair differs -> the divergence is an
                    # extra/missing row past the common prefix
                    diff = min(len(sd), len(dd))
                srow = sd[diff] if diff < len(sd) else "<no row>"
                drow = dd[diff] if diff < len(dd) else "<no row>"
                print(f"   first differing row (sorted #{diff}, cols "
                      f"{sorted(scols)}):\n   spark: {srow}\n   duck : {drow}")
    spark.stop()
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
