"""Multimodal plumbing tests: binary columns + deterministic decode-stub
features via mapInPandas; frame sampling."""

from ch_pdf_parse_spark.operators.multimodal import (
    _expected_feature,
    extract_media_features,
    sample_video_frames,
    synthesize_media,
)


def test_media_features_deterministic(spark, docs_df):
    media = synthesize_media(docs_df)
    rows = extract_media_features(media).collect()
    assert len(rows) == media.count() > 0
    r = min(rows, key=lambda r: r["media_ref"])
    meta = {m["media_ref"]: m["meta"] for m in media.collect()}[r["media_ref"]]
    assert r["n_bytes"] == 1024
    assert r["feature"] == _expected_feature(
        r["media_ref"], meta["width"], meta["height"])


def test_frame_sampling(spark, docs_df):
    media = synthesize_media(docs_df)
    frames = sample_video_frames(media, every=4)
    vids = media.where("media_type = 'video'").select("media_ref", "meta.n_frames")
    want = sum((r["n_frames"] + 3) // 4 for r in vids.collect())
    assert frames.count() == want
    assert frames.where("frame_idx % 4 != 0").count() == 0


def test_phash_dedup_groups_and_keepers(spark):
    """The '#dup' injection must produce multi-document phash groups with
    the lexicographic-min keeper; python twin and Spark kernel agree."""
    from ch_pdf_parse_spark.operators.multimodal import (
        _decode_image, dhash64_py, media_meta_py, multimodal_phash_dedup)

    rows = multimodal_phash_dedup(spark, "/root/testdata/sf0.001").collect()
    assert rows
    multi = [r for r in rows if r.n_media >= 2]
    assert multi, "dup injection must create multi-member groups"
    for r in rows:
        assert len(r.phash) == 16 and int(r.phash, 16) >= 0
        assert r.n_refs <= r.n_media
        assert not r.keeper_doc.endswith("#dup") or r.n_media == 1
    # spot-check the kernel against the pure-python twin for one real ref
    ref = next(r.keeper_ref for r in rows)
    w, h, _nf, payload = media_meta_py(ref)
    assert dhash64_py(_decode_image(payload, w, h)) in {x.phash for x in rows}
