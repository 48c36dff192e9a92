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
