"""Fused wire lifecycle (parse+kernel in one mapInArrow): output must be
row-identical to the composable extract_documents(read_wire(...)) path —
including corrupt-shard per-record drops and null/empty spans — while its
physical plan stays a single zero-Exchange python stage."""

import os

from pyspark.sql import functions as F

from ch_pdf_parse_spark.pipeline import extract_documents
from ch_pdf_parse_spark.sources.wireformat import (
    encode_shard, extract_wire, read_wire)


def _rows(df):
    return sorted(
        ((r.doc_id, tuple(tuple(s) for s in r.spans), r.markdown)
         for r in df.collect()),
        key=lambda t: (t[0] is not None, t[0] or ""))


def _write_shards(tmp, shards):
    d = os.path.join(str(tmp), "shards")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(shards):
        with open(os.path.join(d, f"s{i}.cpw"), "wb") as f:
            f.write(encode_shard(rows))
    return d


_SPAN = dict(kind="text", text="正文内容", media_ref=None, offset=0)


def _doc(i, n_spans):
    return (f"d{i:03d}", [dict(_SPAN, offset=j * 7, text=f"span {j} 文")
                          for j in range(n_spans)])


def test_fused_equals_composable_including_corruption(spark, tmp_path):
    shard0 = [_doc(i, n) for i, n in enumerate([0, 3, 40, 7])]
    shard0.append(("dnull", None))          # NULL spans array
    shard0.append((None, [dict(_SPAN)]))    # NULL doc_id
    shard1 = [_doc(100 + i, 5) for i in range(6)]
    d = _write_shards(tmp_path, [shard0, shard1])

    # corrupt one record mid-shard1: both paths must drop exactly it
    p = os.path.join(d, "s1.cpw")
    b = bytearray(open(p, "rb").read())
    b[len(b) // 2] ^= 0xFF
    open(p, "wb").write(bytes(b))

    fused = extract_wire(spark, d)
    composed = extract_documents(read_wire(spark, d))
    got_f, got_c = _rows(fused), _rows(composed)
    assert got_f == got_c
    # the corruption dropped >=1 record but not the shard
    n_written = len(shard0) + len(shard1)
    assert n_written - 2 <= len(got_f) < n_written


def test_fused_plan_single_python_stage(spark, tmp_path):
    d = _write_shards(tmp_path, [[_doc(i, 3) for i in range(4)]])
    plan = extract_wire(spark, d)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Exchange" not in plan, plan
    assert plan.count("MapInArrow") == 1, plan


def test_fused_column_projection(spark, tmp_path):
    d = _write_shards(tmp_path, [[_doc(i, 3) for i in range(4)]])
    out = extract_wire(spark, d, columns=("markdown",))
    assert out.columns == ["doc_id", "markdown"]
    assert out.count() == 4
