"""Local replica of the driver's correctness gate — driver-faithful edition.

Runs every ``queries()`` entry on Spark and, when an ``oracle_sql()`` twin
exists, the same SQL on DuckDB over the sf parquet tables; compares row count,
column names, the two sides' **Arrow schemas** (canonicalized), and an
order-insensitive **full-precision, type-tagged** value hash (columns sorted
by name, rows sorted).

Why full precision + type tags (round-2 lesson): the driver hash-failed two
queries whose values were bit-identical cross-engine because DuckDB's integer
``sum()`` returns HUGEINT, which exports via Arrow as decimal128(38,0) — the
old ``%.6g``/``str()`` normalization here stringified ``Decimal('5')`` and
``5`` identically and so could never see what the driver saw. Values are now
normalized with a type prefix (``i:5`` vs ``dec:5``) and floats at full
``repr`` precision, and the DuckDB result is fetched ONCE as an Arrow table so
its schema is compared against Spark's (``to_arrow_schema``) in canonical form.

Usage:

    python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import hashlib
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ch_pdf_parse_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon_arrow_type(t: pa.DataType) -> str:
    """Canonical form of an Arrow type for cross-engine schema comparison.

    Integer widths and string largeness are hash-equivalent (both engines
    stringify 5 as 5), so they collapse; decimal stays DISTINCT from int —
    that distinction is exactly the round-2 driver failure (HUGEINT →
    decimal128(38,0) vs int64). Decimal scale is kept because a scale
    difference changes the stringified value ('1.20' vs '1.2')."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal(s={t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return f"list<{canon_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{canon_arrow_type(t.field(i).type)}"
                         for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_arrow_type(t.key_type)},{canon_arrow_type(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def canon_schema(sch: pa.Schema) -> dict[str, str]:
    return {name: canon_arrow_type(sch.field(name).type) for name in sch.names}


def spark_arrow_schema(sdf) -> pa.Schema:
    """Arrow schema Spark would export, derived from the plan (no execution)."""
    from pyspark.sql.pandas.types import to_arrow_schema
    return to_arrow_schema(sdf.schema)


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
    """Full-precision, type-tagged normalization.

    Type tags make Decimal vs int vs float DIFFERENT even when str() agrees
    (the driver's hasher distinguishes them; the old untagged str() here could
    not). Floats use repr — shortest round-trip representation — so any
    sub-%.6g cross-engine drift fails locally before it fails at the driver."""
    if v is None:
        return "\x00"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f"b:{v}"
    if isinstance(v, float):
        return "f:" + repr(v)
    if isinstance(v, Decimal):
        return "dec:" + str(v)
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return "t:" + v.isoformat()
    if isinstance(v, dict):  # duckdb STRUCT / Spark Row (via asDict below)
        return "{" + ",".join(
            f"{k}={_norm(x)}" for k, x in sorted(v.items())) + "}"
    if hasattr(v, "asDict"):  # pyspark Row
        return _norm(v.asDict())
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    return "s:" + str(v)


def duck_fetch(con, sql: str):
    """One execution → (cols, rows, canonical arrow schema)."""
    tbl = con.execute(sql).fetch_arrow_table()
    cols = list(tbl.schema.names)
    cols_idx = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = list(zip(*cols_idx)) if tbl.num_columns else []
    if tbl.num_rows and not rows:
        rows = [()] * tbl.num_rows
    return cols, rows, canon_schema(tbl.schema)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-queries", shuffle_partitions=16)
    # ship the package zip to python workers up front: queries built on
    # module-level pandas_udfs (similarity sig bits, tokenizer, ...) pickle
    # those functions BY REFERENCE, so a worker must be able to import
    # ch_pdf_parse_spark even when this tool is driven from a cwd outside
    # /root/repo (only extract_documents ships the zip on its own)
    from ch_pdf_parse_spark.packaging import ensure_on_executors

    ensure_on_executors(spark)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # golden-parquet oracles (extraction/multimodal) materialize at the scale
    # this run compares at — the driver itself uses the sf0.01 default
    os.environ["CHPDF_ORACLE_SF_DIR"] = sf_dir
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sschema = canon_schema(spark_arrow_schema(sdf))
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
            dcols, drows, dschema = duck_fetch(con, sqls[name])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        ok_cnt = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_schema = ok_cols and sschema == dschema
        ok_hash = ok_cols and value_hash(scols, srows) == value_hash(dcols, drows)
        ok = ok_cnt and ok_cols and ok_schema and ok_hash
        status = "OK   " if ok else "FAIL "
        print(f"{status} {name}: rows {len(srows)}/{len(drows)} cols={ok_cols} "
              f"schema={ok_schema} hash={ok_hash} [{time.time() - t0:.1f}s]")
        if not ok:
            failed.append(name)
            if not ok_cols:
                print(f"   spark cols: {sorted(scols)}\n   duck  cols: {sorted(dcols)}")
                continue
            if not ok_schema:
                for c in sorted(scols):
                    if sschema.get(c) != dschema.get(c):
                        print(f"   schema[{c}]: spark={sschema.get(c)} "
                              f"duck={dschema.get(c)}")
            if not ok_hash and srows and drows:
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
