"""Annotation-JSON ingest (SURVEY.md §2.1 S3): the reference's training
corpus loader re-expressed as a declarative Spark source.

The reference concatenates per-document JSON files, defaulting missing keys
imperatively (/root/reference/train/preprocess.py:6-26,95-111). Two schema
variants exist (FIXTURES.md §3):

* variant A: ``text_region`` is a 4-point quad, has ``region_type`` and
  page-level ``position`` citation spans;
* variant B: ``text_region`` is a 4-float rect, no ``region_type``/``position``.

Both normalize to one span struct here:

* quad→rect projection (P8, train/preprocess.py:108-111) — ``text_region`` is
  read as a *raw JSON string* and parsed twice (rect + quad schemas) with
  ``coalesce``, so one scan handles both variants;
* ``structure_function`` ← ``region_type`` defaulting (P9, :104-105);
* ``position`` ← [] defaulting (:95-96);
* bbox 1024-normalization (P6, predict/pdf2markdown.py:240-248);
* page-position bucketing (P7, :212-215).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

ANNOT_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("image_id", T.LongType()),
    T.StructField("pdf", T.StringType()),
    T.StructField("image_size", T.ArrayType(T.LongType())),
    T.StructField("position", T.ArrayType(T.ArrayType(T.LongType()))),
    T.StructField("annotate", T.ArrayType(T.StructType([
        # raw JSON text: quad (array<array<double>>) OR rect (array<double>)
        T.StructField("text_region", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("order", T.LongType()),
        T.StructField("need-info", T.BooleanType()),
        T.StructField("region_type", T.StringType()),
        T.StructField("new_line", T.BooleanType()),
        T.StructField("structure_function", T.StringType()),
    ]))),
]))


def read_annotations(spark: SparkSession, path: str) -> DataFrame:
    """One row per (doc, page, segment) with normalized geometry and kinds."""
    # files are bare page arrays (the reference's shape); multiLine mode
    # explodes each array element to a row
    bare = (
        spark.read.option("multiLine", "true")
        .schema(ANNOT_SCHEMA.elementType)
        .json(path)
        .withColumn("src_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
    )
    pages = bare.withColumn(
        "doc_id",
        F.coalesce(
            F.col("pdf"),
            F.regexp_replace("src_file", r"\.json$", ""),
        ),
    )
    # total_page per document (the reference attaches len(jsonlist),
    # train/preprocess.py:16-25)
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id")
    pages = pages.withColumn("total_page", F.count("*").over(wdoc))

    seg = pages.select(
        "doc_id", "total_page",
        F.col("image_id").cast("int").alias("page_id"),
        F.col("image_size").alias("image_size"),
        F.coalesce("position", F.array().cast("array<array<bigint>>")).alias("position"),
        F.posexplode("annotate").alias("seg_idx", "a"),
    )

    rect = F.from_json(F.col("a.text_region"), "array<double>")
    quad = F.from_json(F.col("a.text_region"), "array<array<double>>")
    x1 = F.coalesce(quad[0][0], rect[0])
    y1 = F.coalesce(quad[0][1], rect[1])
    x2 = F.coalesce(quad[2][0], rect[2])
    y2 = F.coalesce(quad[2][1], rect[3])

    # P6: 1024 normalization by the longer page side (int truncation, X7).
    # try_divide/try_element_at, not //element_at: under ANSI a single
    # corrupt page (image_size [0, 0], or a 1-element/absent image_size)
    # would abort the WHOLE ingest job (the reference's per-request
    # ZeroDivisionError/IndexError analog must degrade per-RECORD in a
    # batch engine) — the page's bboxes normalize to NULL instead and the
    # row survives for downstream filtering.
    # (gate on exactly 2 NON-NULL sides: greatest() skips NULLs, so both a
    # 1-element image_size AND a partially-null one like [800, NULL] would
    # otherwise silently normalize by the one present side — corrupt shapes
    # must all degrade to NULL bboxes the same way)
    side1 = F.try_element_at("image_size", F.lit(1))
    side2 = F.try_element_at("image_size", F.lit(2))
    scale = F.when(
        (F.size("image_size") == 2) & side1.isNotNull() & side2.isNotNull(),
        F.try_divide(F.lit(1024.0), F.greatest(side1, side2)) - 0.00001)
    norm = [F.floor(v * scale).cast("int") for v in (x1, y1, x2, y2)]

    # P5: bbox sanitization (inverted/degenerate boxes,
    # predict/ppocr_server.py:98-101)
    nx1, ny1, nx2, ny2 = norm
    nx2 = F.when(nx2 <= nx1, nx1 + 5).otherwise(nx2)
    ny2 = F.when(ny2 <= ny1, ny1 + 1).otherwise(ny2)

    return seg.select(
        "doc_id", "total_page", "page_id", "seg_idx", "position",
        F.col("a.text").alias("text"),
        F.coalesce(F.col("a.structure_function"), F.col("a.region_type"),
                   F.lit("text")).alias("kind"),  # P9 defaulting
        F.coalesce(F.col("a.new_line"), F.lit(True)).alias("new_line"),
        F.coalesce(F.col("a.`need-info`"), F.lit(True)).alias("need_info"),
        F.struct(nx1.alias("x1"), ny1.alias("y1"), nx2.alias("x2"), ny2.alias("y2"))
        .alias("bbox"),
        # P7: page-position bucket 19*i // (total-1)
        F.when(F.col("total_page") == 1, 0)
        .otherwise(F.expr("(19 * page_id) div (total_page - 1)"))
        .cast("int").alias("page_position"),
    )


def citation_labels(segments: DataFrame) -> DataFrame:
    """J3: citation-span labels — explode page-level ``position`` entries
    ``[annot_idx, start_char|-1, end_char, category]`` and equi-join them to
    their segment, with the char-range kept for the downstream interval
    overlap against token offsets (train/preprocess.py:95-98,144-187).

    P4 gate: only ``need-info == True`` segments contribute supervision —
    every training branch in the reference requires it
    (train/preprocess.py:312,338,364,418,444,470) and ``need-info == False``
    segments are mask-excluded (:547), so their citation positions never
    become labels."""
    pos = (
        segments.select("doc_id", "page_id", F.explode("position").alias("p"))
        .select(
            "doc_id", "page_id",
            F.col("p")[0].cast("int").alias("seg_idx"),
            F.col("p")[1].alias("start_char"),
            F.col("p")[2].alias("end_char"),
            F.col("p")[3].cast("int").alias("category"),
        )
        .distinct()
    )
    segs = segments.where(F.col("need_info")).select(
        "doc_id", "page_id", "seg_idx", "text", "kind")
    return pos.join(segs, ["doc_id", "page_id", "seg_idx"]).select(
        "doc_id", "page_id", "seg_idx", "kind", "text",
        "start_char", "end_char", "category",
    )
