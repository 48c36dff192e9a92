"""spark-submit entry point (north_rule packaging).

    python tools/make_submit_zip.py           # builds ch_pdf_parse_spark.zip
    spark-submit --driver-memory 16g \
        --py-files /tmp/ch_pdf_parse_spark.zip job.py \
        --input <documents parquet/iceberg ref> \
        --output <output dir> [--buckets 64] [--cores N] [--parallelism 8]

``--driver-memory 16g`` is required in local mode: spark-submit creates the
JVM BEFORE get_spark's config can apply, so the session's heap sizing is
silently ignored and the default 1g heap OOMs the vectorized parquet reader
on wide nested rows (heap must cover concurrent scan tasks × reader-batch
bytes — BENCH/BASELINE.md). On a real cluster the same rule applies to
``--executor-memory``.

Runs the flagship extraction with per-partition lineage; re-running after a
kill resumes without recomputing completed buckets (sources/lineage.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--no-lineage", action="store_true",
                    help="single-pass write, no checkpoint/resume")
    ap.add_argument("--parallelism", type=int, default=1,
                    help="buckets submitted concurrently (Spark scheduler "
                         "interleaves the jobs; use when one bucket's tasks "
                         "don't fill the cluster)")
    ap.add_argument("--columns", default="spans,markdown",
                    help="output columns to build and ship (comma-separated "
                         "subset of spans,markdown): projection pushdown "
                         "through the extraction UDF — a spans-only job "
                         "skips Arrow-shipping every markdown string")
    ap.add_argument("--no-stage-input", action="store_true",
                    help="skip the bucket-partitioned staging copy (use when "
                         "the input is already bucketed, e.g. an Iceberg "
                         "table with a bucket(doc_id, N) spec)")
    ap.add_argument("--input-format", choices=("table", "wire"),
                    default="table",
                    help="'table' = parquet/Iceberg documents table; 'wire' "
                         "= directory of packed binary .cpw shards "
                         "(sources/wireformat.py) read via binaryFile and "
                         "parsed per-record — the raw-bytes S1 lifecycle; "
                         "corrupt records are dropped per-record and the "
                         "per-shard drop count is reported")
    args = ap.parse_args()

    try:
        from ch_pdf_parse_spark.session import get_spark
    except ImportError:  # running from the repo without --py-files
        import os

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from ch_pdf_parse_spark.session import get_spark

    from ch_pdf_parse_spark.pipeline import extract_documents
    from ch_pdf_parse_spark.sources.catalog import read_table, write_table
    from ch_pdf_parse_spark.sources.lineage import run_with_lineage

    spark = get_spark("ch-pdf-parse-extract", cores=args.cores)
    t0 = time.time()
    wire_corrupt = None
    if args.input_format == "wire":
        from ch_pdf_parse_spark.sources.wireformat import (read_wire,
                                                           wire_scan_stats)

        docs = read_wire(spark, args.input)
        # ingest audit: one extra pass over the shards, but framing+CRC walk
        # only (scan_shard_stats — no string decode, so it does NOT double
        # the ingest's dominant parse cost) so a silently-dropped corrupt
        # record is reported, with the exact shard to re-fetch, instead of
        # vanishing from the output
        bad = (wire_scan_stats(spark, args.input)
               .where("n_corrupt > 0").collect())
        wire_corrupt = {r["shard_path"]: r["n_corrupt"] for r in bad}
    else:
        docs = read_table(spark, args.input)
    # fail fast with a readable message BEFORE the staging copy: a wrong
    # table (e.g. a text corpus without spans) otherwise surfaces as an
    # unresolved-column plan dump after a full wasted input pass
    missing = {"doc_id", "spans"} - set(docs.columns)
    if missing:
        sys.exit(f"job.py: input {args.input} lacks required column(s) "
                 f"{sorted(missing)}; schema is "
                 f"{docs.schema.simpleString()} — expected the interleaved "
                 f"corpus (doc_id, spans array<struct<kind,text,media_ref,"
                 f"offset>>)")
    from ch_pdf_parse_spark.pipeline import normalize_columns

    try:
        # validate BEFORE the lineage manifest and the full staging copy —
        # a typo'd --columns must fail here, not one input pass later
        cols = normalize_columns(
            tuple(c.strip() for c in args.columns.split(",") if c.strip()))
    except ValueError as e:
        sys.exit(f"job.py: {e}")
    if args.no_lineage:
        if args.input_format == "wire":
            # single-pass wire mode takes the FUSED lifecycle (round 6:
            # parse + kernel in one mapInArrow, 1.8× — parsed spans never
            # re-cross the JVM boundary; output pinned row-identical to
            # extract_documents(read_wire(...)) in tests/test_wire_fused).
            # Lineage mode keeps the composable path: its bucket jobs
            # filter the parsed documents rows by doc_id hash.
            from ch_pdf_parse_spark.sources.wireformat import extract_wire

            write_table(extract_wire(spark, args.input, columns=cols),
                        args.output)
        else:
            write_table(extract_documents(docs, columns=cols), args.output)
        computed = ["all"]
        # parquet count() is footer-metadata only — no second data pass
        n_docs = read_table(spark, args.output).count()
    else:
        computed = run_with_lineage(spark, docs, args.output,
                                    n_buckets=args.buckets,
                                    stage_input=not args.no_stage_input,
                                    parallelism=args.parallelism,
                                    columns=cols)
        # doc totals come from the lineage table (collected per bucket while
        # extracting) — docs.count() here would be a full second input scan,
        # i.e. another 10^12-row pass purely for a metrics line
        from ch_pdf_parse_spark.sources.lineage import read_lineage

        n_docs = (read_lineage(spark, args.output)
                  .where("status = 'done'")
                  .agg({"doc_count": "sum"}).collect()[0][0]) or 0
    wall = time.time() - t0
    out = {
        "input": args.input, "output": args.output,
        "buckets_computed": len(computed), "docs": n_docs,
        "wall_sec": round(wall, 2), "docs_per_sec": round(n_docs / wall, 1),
    }
    if wire_corrupt is not None:
        out["wire_corrupt_records"] = sum(wire_corrupt.values())
        out["wire_corrupt_shards"] = sorted(wire_corrupt)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
