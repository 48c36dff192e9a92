"""Per-partition checkpoint/lineage with resume-without-recompute.

North-rule requirement (SURVEY.md §4 Q7): the reference checkpoints every
5000 steps and resumes from the last checkpoint
(/root/reference/train/train_main.py:177-186,247); batch Spark has task-level
retry but no built-in *job-level* resume. This module provides it:

* the corpus is split into ``n_buckets`` deterministic doc_id hash buckets
  (same bucketing the Iceberg table would declare: ``bucket(doc_id, N)``);
* each bucket is extracted and written as its own output partition, then a
  lineage record ``(bucket, doc_count, span_count, wall_ms, status)`` is
  appended;
* on (re)start, completed buckets are removed via a **left_anti join**
  against the lineage table — a killed run resumes exactly where it stopped,
  never recomputing a completed partition.

At cluster scale each bucket is a few thousand input files / many tasks, so
the driver-side bucket loop adds negligible orchestration overhead relative
to bucket runtime; buckets could also be submitted concurrently from threads
(Spark scheduler pools) without changing the lineage protocol.
"""

from __future__ import annotations

import os
import threading
import time

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

LINEAGE_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("doc_count", T.LongType()),
    T.StructField("span_count", T.LongType()),
    T.StructField("wall_ms", T.LongType()),
    T.StructField("status", T.StringType()),
])


def lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    p = lineage_path(out_dir)
    try:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(p)
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def with_bucket(docs: DataFrame, n_buckets: int) -> DataFrame:
    return docs.withColumn("bucket", F.pmod(F.hash("doc_id"), F.lit(n_buckets)).cast("int"))


def run_with_lineage(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    fail_after: int | None = None,
    stage_input: bool = True,
    parallelism: int = 1,
    columns: tuple[str, ...] = ("spans", "markdown"),
) -> list[int]:
    """Extract ``docs`` bucket-by-bucket with lineage; returns the list of
    buckets computed in THIS invocation (completed ones are skipped via
    anti-join). ``fail_after`` aborts after k buckets — the kill/resume test
    hook (SURVEY.md §5 property test 3).

    ``stage_input``: a per-bucket filter on hash(doc_id) cannot prune a plain
    parquet layout, so bucket-by-bucket extraction would re-scan the full
    input once per bucket — N full passes at 10^12 rows. Staging writes the
    input ONCE partitioned by bucket (the parquet stand-in for an Iceberg
    ``bucket(doc_id, N)`` spec); every per-bucket read is then
    directory-pruned. On an actually-bucketed Iceberg table pass False.

    Resume assumes the SAME input, bucketing AND output projection: a
    manifest (n_buckets + input file list + columns) is recorded at staging
    time; a later call into the same ``out_dir`` with a different input,
    n_buckets or ``columns`` raises instead of silently extracting against
    the stale snapshot (or writing mixed-schema buckets)."""
    import hashlib
    import json

    from ..pipeline import extract_documents, normalize_columns

    # fail fast (and canonicalize for the manifest signature) before any
    # staging work — see pipeline.normalize_columns
    columns = normalize_columns(columns)

    os.makedirs(out_dir, exist_ok=True)
    # input identity from file-level metadata only (no data scan): catches
    # appended/replaced part-files, files overwritten IN PLACE under the same
    # names (size+mtime for locally statable files), and a changed n_buckets
    files = sorted(docs.inputFiles())
    if not files:
        # createDataFrame/views have no backing files — their identity cannot
        # be established, so a reused out_dir would silently pass the guard
        # and extract against a stale _staged snapshot
        raise ValueError(
            "input DataFrame has no backing files (inputFiles() is empty); "
            "resume identity cannot be established — write the input to "
            "parquet/a table first")
    from urllib.parse import unquote, urlparse

    file_meta = []
    for f in files:
        # inputFiles() returns percent-encoded URIs ("file:/data/my%20corpus/
        # part-0"); decode before stat or paths with spaces/non-ASCII silently
        # fall back to name-only identity
        u = urlparse(f)
        local = unquote(u.path) if u.scheme in ("file", "") else None
        if local and os.path.exists(local):
            st = os.stat(local)
            # mtime_ns, not int(mtime): whole-second truncation misses
            # same-size in-place overwrites within one second
            file_meta.append([f, st.st_size, st.st_mtime_ns])
        else:  # remote (hdfs/s3/...) — name-only identity
            file_meta.append([f])
    # v1 hashed bare names; v2 adds [size, mtime_ns]; v3 adds the output
    # column projection — resuming with a different --columns would silently
    # mix schemas across buckets (half with markdown, half without), which
    # Spark's footer sampling then papers over as nulls
    SIG_VERSION = 3
    sig = hashlib.sha256(json.dumps(
        {"n_buckets": n_buckets, "files": file_meta,
         "columns": sorted(columns)}
    ).encode()).hexdigest()[:16]
    manifest = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            prev = json.load(f)
        if prev.get("sig_version", 1) != SIG_VERSION:
            raise ValueError(
                f"{out_dir} holds a manifest written by an older engine "
                f"version (sig_version {prev.get('sig_version', 1)} != "
                f"{SIG_VERSION}); its identity cannot be compared — use a "
                "fresh out_dir (or delete the old one to recompute)")
        if prev.get("sig") != sig:
            raise ValueError(
                f"{out_dir} holds lineage/staging for a different input or "
                f"n_buckets (manifest sig {prev.get('sig')} != {sig}); "
                "use a fresh out_dir or delete the old one")
    else:
        with open(manifest, "w") as f:
            json.dump({"sig": sig, "n_buckets": n_buckets,
                       "sig_version": SIG_VERSION}, f)

    if stage_input:
        staged = os.path.join(out_dir, "_staged")
        if not os.path.exists(os.path.join(staged, "_SUCCESS")):
            # crash-safe: _SUCCESS lands last; a kill mid-staging restages
            with_bucket(docs, n_buckets).write.mode("overwrite") \
                .partitionBy("bucket").parquet(staged)
        bucketed = spark.read.parquet(staged)
    else:
        bucketed = with_bucket(docs, n_buckets)

    done = read_lineage(spark, out_dir).where(F.col("status") == "done") \
        .select("bucket").distinct()
    # bucket ids are range(n_buckets) by construction — enumerating them from
    # the data would full-scan the corpus (a wasted pass at 10^12 rows)
    all_buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"))
    remaining = all_buckets.join(done, "bucket", "left_anti").orderBy("bucket")
    todo = [r["bucket"] for r in remaining.collect()]

    lineage_lock = threading.Lock()

    def do_bucket(b: int) -> int:
        t0 = time.time()
        part = bucketed.where(F.col("bucket") == b).drop("bucket")
        out = extract_documents(part, columns=columns)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"bucket={b}"))
        span_stat = (F.sum(F.size("spans")) if "spans" in columns
                     else F.lit(0))  # markdown-only runs carry no span count
        stats = (
            spark.read.parquet(os.path.join(out_dir, f"bucket={b}"))
            .agg(F.count("*").alias("d"), span_stat.alias("s"))
            .collect()[0]
        )
        rec = [(b, stats["d"], stats["s"] or 0,
                int((time.time() - t0) * 1000), "done")]
        # the bucket's data is fully committed before its lineage row lands,
        # so a kill between the two re-extracts the bucket (idempotent
        # overwrite), never records a bucket it didn't finish. The lock only
        # serializes the tiny lineage append (concurrent parquet appends to
        # one directory race in _temporary staging).
        with lineage_lock:
            spark.createDataFrame(rec, LINEAGE_SCHEMA).write.mode("append") \
                .parquet(lineage_path(out_dir))
        return b

    computed: list[int] = []
    if parallelism <= 1:
        for i, b in enumerate(todo):
            if fail_after is not None and i >= fail_after:
                raise RuntimeError(
                    f"injected failure after {fail_after} buckets")
            computed.append(do_bucket(b))
        return computed
    # concurrent bucket submission (Spark scheduler interleaves the jobs):
    # keeps a large cluster busy when single buckets don't fill it.
    if fail_after is not None:
        raise ValueError("fail_after is a serial-mode test hook")
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=parallelism) as pool:
        computed = list(pool.map(do_bucket, todo))
    return computed


def lineage_report(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-partition metrics (north_rule: 'per-partition lineage + metrics'):
    docs/sec and spans/sec per bucket plus a TOTAL row — the operational view
    of a run (skew shows up as a bucket whose docs_per_sec lags its peers)."""
    lin = read_lineage(spark, out_dir).where(F.col("status") == "done")
    per = lin.select(
        F.col("bucket").cast("string").alias("bucket"),
        "doc_count", "span_count", "wall_ms",
        F.round(F.col("doc_count") * 1000.0 / F.greatest("wall_ms", F.lit(1)), 1)
        .alias("docs_per_sec"),
    )
    total = lin.agg(
        F.lit("TOTAL").alias("bucket"),
        F.sum("doc_count").alias("doc_count"),
        F.sum("span_count").alias("span_count"),
        F.sum("wall_ms").alias("wall_ms"),
        F.round(F.sum("doc_count") * 1000.0
                / F.greatest(F.sum("wall_ms"), F.lit(1)), 1)
        .alias("docs_per_sec"),
    )
    return per.unionByName(total)


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    parts = [os.path.join(out_dir, d) for d in os.listdir(out_dir)
             if d.startswith("bucket=")]
    return spark.read.parquet(*parts)
