"""Schema-variant parsing tests (FIXTURES.md §3): variants A (quad
text_region + region_type + position) and B (rect, no region_type) normalize
to the same span struct."""

import json

import pytest

from ch_pdf_parse_spark.sources.annotations import citation_labels, read_annotations

VARIANT_A = [
    {
        "image_id": 0,
        "image_size": [1654, 2339],
        "position": [[0, 5, 8, 1], [1, -1, 3, 2]],
        "annotate": [
            {
                "text_region": [[100, 200], [400, 200], [400, 260], [100, 260]],
                "text": "引言[12]内容",
                "order": 1,
                "need-info": True,
                "region_type": "text",
                "new_line": True,
                "structure_function": "text",
            },
            {
                "text_region": [[100, 300], [400, 300], [400, 360], [100, 360]],
                "text": "无结构标注",
                "order": 2,
                "need-info": False,
                "region_type": "title",
                "new_line": True,
            },
        ],
    },
    {
        "image_id": 1,
        "image_size": [1654, 2339],
        "position": [],
        "annotate": [
            {
                # degenerate box: x2 <= x1 must be sanitized (P5)
                "text_region": [[500, 100], [480, 100], [480, 100], [500, 100]],
                "text": "坏框",
                "order": 1,
                "need-info": True,
                "region_type": "text",
                "new_line": False,
                "structure_function": "text",
            }
        ],
    },
]

VARIANT_B = [
    {
        "pdf": "paper_b",
        "image_id": 0,
        "image_size": [2339, 1654],
        "annotate": [
            {
                "text_region": [50, 60, 900, 120],
                "text": "B变体第一行",
                "order": 1,
                "new_line": True,
            }
        ],
    }
]


@pytest.fixture(scope="module")
def annot_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("annot")
    (d / "paper_a.json").write_text(json.dumps(VARIANT_A, ensure_ascii=False))
    (d / "paper_b.json").write_text(json.dumps(VARIANT_B, ensure_ascii=False))
    return str(d)


def test_both_variants_normalize(spark, annot_dir):
    segs = read_annotations(spark, annot_dir)
    rows = {(r["doc_id"], r["page_id"], r["seg_idx"]): r for r in segs.collect()}
    assert len(rows) == 4

    a0 = rows[("paper_a", 0, 0)]
    # quad→rect + 1024 normalization by long side (2339)
    scale = 1024 / 2339 - 1e-5
    assert a0["bbox"]["x1"] == int(100 * scale)
    assert a0["bbox"]["y2"] == int(260 * scale)
    assert a0["kind"] == "text" and a0["new_line"] is True
    assert a0["total_page"] == 2

    # P9: structure_function defaulted from region_type
    a1 = rows[("paper_a", 0, 1)]
    assert a1["kind"] == "title"
    assert a1["need_info"] is False  # P4: explicit need-info passes through

    # P5: degenerate box sanitized
    bad = rows[("paper_a", 1, 0)]
    assert bad["bbox"]["x2"] == bad["bbox"]["x1"] + 5

    # variant B: rect text_region, doc_id from pdf field, single… two files
    b0 = rows[("paper_b", 0, 0)]
    assert b0["bbox"]["x1"] == int(50 * (1024 / 2339 - 1e-5))
    assert b0["kind"] == "text"  # no region_type/structure_function → default
    assert b0["need_info"] is True  # missing need-info defaults True
    assert b0["total_page"] == 1 and b0["page_position"] == 0


def test_citation_label_join(spark, annot_dir):
    segs = read_annotations(spark, annot_dir)
    labels = {(r["seg_idx"], r["category"]): (r["start_char"], r["end_char"])
              for r in citation_labels(segs).collect()}
    # P4: seg 1 of paper_a has need-info == False, so its position entry
    # ([1, -1, 3, 2]) is mask-excluded from supervision
    # (train/preprocess.py:547); variant B (need-info absent → True) has no
    # position entries, so the gate must not invent labels for it either
    assert labels == {(0, 1): (5, 8)}


def test_hostile_pages_degrade_per_record(spark, tmp_path):
    """A single corrupt page (image_size [0,0], null/short image_size,
    unparseable text_region, null annotate) must never abort the ingest job
    under ANSI — the bad page's bboxes go NULL and every parseable segment
    survives (tools/adversarial probe, 100 TB contract: per-record
    degradation, not per-job)."""
    import json

    pages = [
        {"image_id": 0, "pdf": "d", "image_size": [0, 0],
         "annotate": [{"text_region": "[1,2,3,4]", "text": "zero"}]},
        {"image_id": 1, "pdf": "d", "image_size": None,
         "annotate": [{"text_region": "[[1,2],[3,4],[5,6],[7,8]]",
                       "text": "nullsize"}]},
        {"image_id": 2, "pdf": "d", "image_size": [800],
         "annotate": [{"text_region": "not json", "text": "badregion"}]},
        {"image_id": 3, "pdf": "d", "image_size": [800, 600],
         "annotate": None},
        {"image_id": 4, "pdf": "d", "image_size": [800, 600],
         "annotate": [{"text_region": "[10,10,20,20]", "text": "good"}]},
        {"image_id": 5, "pdf": "d", "image_size": [800, None],
         "annotate": [{"text_region": "[10,10,20,20]", "text": "halfnull"}]},
    ]
    (tmp_path / "d.json").write_text(json.dumps(pages))
    rows = {r["page_id"]: r for r in
            read_annotations(spark, str(tmp_path)).collect()}
    # pages with a parseable annotate list each emit their segment
    assert set(rows) == {0, 1, 2, 4, 5}
    assert rows[0]["bbox"]["x1"] is None      # zero page side -> NULL bbox
    assert rows[1]["bbox"]["x1"] is None      # null image_size -> NULL bbox
    assert rows[2]["bbox"]["x1"] is None      # unparseable text_region
    assert rows[4]["bbox"]["x1"] == int(10 * (1024 / 800 - 1e-5))
    assert rows[4]["text"] == "good"
    # [800, NULL] passes the size==2 gate but greatest() would skip the NULL
    # and silently normalize by the one present side — must degrade like the
    # other corrupt shapes instead
    assert rows[5]["bbox"]["x1"] is None
