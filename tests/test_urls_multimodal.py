"""URL extraction (S3-S5) + multimodal plumbing."""

import hashlib

from baram_spark.sources.urls import extract_urls, extract_urls_df, normalize_url


def test_normalize_variants():
    canon = "https://n.news.naver.com/mnews/article/001/0014123456"
    assert normalize_url(canon) == canon
    assert normalize_url("https://m.news.naver.com/article/001/0014123456") == canon
    assert normalize_url("/article/001/0014123456") == canon
    assert normalize_url("https://x.com/read?oid=001&aid=0014123456") == canon
    assert normalize_url("https://example.com/other") is None


def test_extract_urls_dedup_sorted():
    html = (
        '<a href="/article/002/0000000010">b</a>'
        '<a href="/article/001/0000000010">a</a>'
        '<a href="/article/002/0000000010">dup</a>'
    )
    urls = extract_urls(html)
    assert urls == sorted(urls)
    assert len(urls) == 2


def test_extract_urls_df(spark):
    html1 = b'<a href="/article/001/0000000010">x</a><a href="/mnews/article/002/0000000011">y</a>'
    html2 = b'<a href="/article/001/0000000010">dup</a>'
    df = spark.createDataFrame([(html1,), (html2,)], "html binary")
    urls = [r["url"] for r in extract_urls_df(df).collect()]
    assert urls == [
        "https://n.news.naver.com/mnews/article/001/0000000010",
        "https://n.news.naver.com/mnews/article/002/0000000011",
    ]


def test_multimodal_features(spark):
    from baram_spark.operators.multimodal import extract_features, sample_frames

    rows = [
        (1, "image", b"\x89PNGfake", "image/png", 64, 64, None),
        (2, "audio", b"RIFFfake", "audio/wav", None, None, 2000),
        (3, "video", b"\x00\x00ftypfake", "video/mp4", 640, 480, 3500),
        (4, "image", None, "image/png", 0, 0, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["ok"] and len(feats[1]["feat"]) == 32
    assert feats[1]["sha256"] == hashlib.sha256(b"\x89PNGfake").hexdigest()
    assert feats[4]["n_bytes"] == 0  # null payload handled

    frames = sample_frames(media, every_ms=1000, max_frames=8).collect()
    assert {r["media_id"] for r in frames} == {3}
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2]
    # deterministic fingerprints
    f0 = [r for r in frames if r["frame_idx"] == 0][0]
    assert f0["frame_sha"] == hashlib.sha256(
        b"\x00\x00ftypfake" + (0).to_bytes(4, "little")
    ).hexdigest()
