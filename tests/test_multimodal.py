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


def test_phash_neardup_pairs_and_hamming(spark):
    """Every injected 2-bit variant must pair with its source through the
    chunk bands, every reported hamming must equal the true 64-bit popcount
    (python twin), and no pair may exceed the cap."""
    from ch_pdf_parse_spark.operators.multimodal import (
        NEARDUP_MAX_HAMMING, multimodal_phash_dedup, multimodal_phash_neardup)

    sf = "/root/testdata/sf0.001"
    hashes = {r.phash for r in
              multimodal_phash_dedup(spark, sf).select("phash").collect()}
    pairs = multimodal_phash_neardup(spark, sf).collect()
    assert pairs

    def ham(a: str, b: str) -> int:
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    got = {(r.phash_a, r.phash_b): r.hamming for r in pairs}
    for (a, b), h in got.items():
        assert a < b
        assert h == ham(a, b) <= NEARDUP_MAX_HAMMING

    # python twin of the variant injection: xor bit 3 of chunk 0 and bit 12
    # of chunk 2 (hamming 2, bands 1 and 3 untouched)
    def variant(ph: str) -> str:
        c0 = format(int(ph[0:4], 16) ^ 8, "04x")
        c2 = format(int(ph[8:12], 16) ^ 4096, "04x")
        return c0 + ph[4:8] + c2 + ph[12:16]

    expected = {tuple(sorted((ph, variant(ph))))
                for ph in hashes if ph[15] in "0123"}
    assert expected, "the deterministic 1/4 predicate must select some hashes"
    assert expected <= set(got), "every injected variant must be recovered"
    for a, b in expected:
        assert got[(a, b)] == 2
