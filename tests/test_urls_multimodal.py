"""URL extraction (S3-S5) + multimodal plumbing."""

import hashlib

import numpy as np
import pytest

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
    assert not feats[1]["decoded"]  # fake PNG → stub tier
    assert feats[1]["sha256"] == hashlib.sha256(b"\x89PNGfake").hexdigest()
    assert feats[4]["n_bytes"] == 0  # null payload handled

    frames = sample_frames(media, every_ms=1000, max_frames=8).collect()
    assert {r["media_id"] for r in frames} == {3}
    # ticks 0..3500ms inclusive of tick 0, like the real-MP4 path
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2, 3]
    # deterministic fingerprints
    f0 = [r for r in frames if r["frame_idx"] == 0][0]
    assert f0["frame_sha"] == hashlib.sha256(
        b"\x00\x00ftypfake" + (0).to_bytes(4, "little")
    ).hexdigest()


def _make_bmp(px):
    """Minimal 24-bit BMP encoder (bottom-up, BGR, 4-byte row padding)."""
    import struct

    h, w = px.shape[:2]
    row = (w * 3 + 3) & ~3
    data = bytearray()
    for y in range(h - 1, -1, -1):
        line = bytearray()
        for x in range(w):
            r, g, b = px[y, x]
            line += bytes([b, g, r])
        line += b"\x00" * (row - len(line))
        data += line
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835,
                    2835, 0, 0)
    return bytes(header) + bytes(data)


def _make_ppm(px):
    h, w = px.shape[:2]
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + px.tobytes()


def _make_wav(samples, rate=16000):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((np.asarray(samples) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_real_decoders_roundtrip():
    import numpy as np

    from baram_spark.operators.multimodal import (
        audio_features,
        decode_audio,
        decode_image,
        image_features,
        resize_image,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert (decode_image(_make_bmp(px)) == px).all()
    assert (decode_image(_make_ppm(px)) == px).all()

    t = np.linspace(0, 1, 16000)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = decode_audio(_make_wav(sig))
    assert rate == 16000 and len(samples) == 16000
    assert abs(float(np.max(samples)) - 0.5) < 0.01

    # resize: exact nearest-neighbor identity at same size, right shape else
    assert (resize_image(px, 7, 5) == px).all()
    assert resize_image(px, 3, 2).shape == (2, 3, 3)

    # features: real histogram / rms energy
    f = image_features(px, 32)
    assert f.shape == (32,) and abs(float(f.sum()) - 1.0) < 1e-6
    a = audio_features(samples, 32)
    assert a.shape == (32,) and 0.3 < float(a.mean()) < 0.4  # rms of 0.5-sine


def test_multimodal_real_decode_in_pipeline(spark):
    import numpy as np

    from baram_spark.operators.multimodal import (
        extract_features,
        image_features,
        resize_images,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    sig = 0.3 * np.sin(np.linspace(0, 60, 8000))
    rows = [
        (1, "image", _make_bmp(px), "image/bmp", 6, 6, None),
        (2, "image", _make_ppm(px), "image/x-portable-pixmap", 6, 6, None),
        (3, "audio", _make_wav(sig), "audio/wav", None, None, 500),
        (4, "image", b"\x89PNGcompressed", "image/png", 2, 2, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["decoded"] and feats[2]["decoded"] and feats[3]["decoded"]
    assert not feats[4]["decoded"]  # PNG → stub tier, still ok
    assert feats[4]["ok"]
    # BMP and PPM carry the same pixels → identical real features
    assert feats[1]["feat"] == feats[2]["feat"]
    expected = image_features(px, 32).tolist()
    assert feats[1]["feat"] == pytest.approx(expected)

    resized = {r["media_id"]: r for r in resize_images(media, 3, 3).collect()}
    assert resized[1]["decoded"] and len(bytes(resized[1]["pixels"])) == 27
    assert bytes(resized[1]["pixels"]) == bytes(resized[2]["pixels"])
    assert not resized[4]["decoded"] and resized[4]["pixels"] is None


# -- PNG real decode (stdlib zlib + scanline unfiltering) --------------------

def _png_filter_lines(flat, w, channels, filters):
    """Filter the scanlines of one (sub-)image; returns the raw byte run."""
    h = flat.shape[0]
    bpp = channels
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.int64)
    for y in range(h):
        f = filters[y % len(filters)] if isinstance(filters, list) else filters
        line = flat[y]
        if f == 0:
            enc = line.copy()
        elif f == 1:  # Sub
            enc = np.array([
                (line[x] - (line[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(len(line))
            ])
        elif f == 2:  # Up
            enc = (line - prev) & 0xFF
        elif f == 3:  # Average
            enc = np.array([
                (line[x] - (((line[x - bpp] if x >= bpp else 0)
                             + prev[x]) >> 1)) & 0xFF
                for x in range(len(line))
            ])
        else:  # Paeth
            enc = []
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((line[x] - pred) & 0xFF)
            enc = np.array(enc)
        raw.append(f)
        raw.extend(bytes(enc.astype(np.uint8)))
        prev = line
    return raw


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _encode_png(px, ctype=2, filters=None, palette=None, interlace=0):
    """Minimal test-side PNG encoder: exercises every scanline filter type
    the decoder must undo (the encoder picks the filter per row), plus
    Adam7 interlace (each of the 7 sub-images filtered independently)."""
    import struct
    import zlib

    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data))

    h, w = px.shape[:2]
    channels = {0: 1, 2: 3, 3: 1, 6: 4}[ctype]
    filters = filters or [0] * h
    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            raw += _png_filter_lines(
                sub.reshape(ph, pw * channels).astype(np.int64),
                pw, channels, filters,
            )
    else:
        raw = _png_filter_lines(
            px.reshape(h, w * channels).astype(np.int64), w, channels,
            filters,
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_png_roundtrip_all_filters():
    from baram_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(16, 11, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        payload = _encode_png(px, ctype=2, filters=filters)
        got = decode_image(payload)
        assert got.shape == (16, 11, 3)
        assert np.array_equal(got, px), filters


def test_png_adam7_interlace_roundtrip():
    from baram_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(11)
    # odd dims exercise the per-pass ceil arithmetic (empty passes too for
    # tiny images); every filter type inside the interlaced sub-images
    for shape in [(16, 11, 3), (7, 5, 3), (3, 2, 3), (1, 1, 3), (9, 16, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        payload = _encode_png(px, ctype=2, filters=[0, 1, 2, 3, 4],
                              interlace=1)
        got = decode_image(payload)
        assert np.array_equal(got, px), shape
    # interlaced palette + RGBA
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(10, 6, 1), dtype=np.uint8)
    got = decode_image(_encode_png(idx, ctype=3, filters=[4], palette=palette,
                                   interlace=1))
    assert np.array_equal(got, palette[idx[..., 0]])
    rgba = rng.integers(0, 256, size=(6, 7, 4), dtype=np.uint8)
    got = decode_image(_encode_png(rgba, ctype=6, filters=[2, 3],
                                   interlace=1))
    assert np.array_equal(got, rgba[..., :3])


def test_png_color_types():
    from baram_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(6)
    # grayscale → replicated channels
    gray = rng.integers(0, 256, size=(7, 9, 1), dtype=np.uint8)
    got = decode_image(_encode_png(gray, ctype=0, filters=[4]))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))
    # RGBA → alpha dropped
    rgba = rng.integers(0, 256, size=(5, 6, 4), dtype=np.uint8)
    got = decode_image(_encode_png(rgba, ctype=6, filters=[1, 2]))
    assert np.array_equal(got, rgba[..., :3])
    # palette
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(8, 8, 1), dtype=np.uint8)
    got = decode_image(_encode_png(idx, ctype=3, filters=[0], palette=palette))
    assert np.array_equal(got, palette[idx[..., 0]])


def test_png_flows_through_feature_pipeline(spark):
    """A PNG payload now rides the REAL tier end-to-end: decoded=true and
    histogram features match the decoded pixels."""
    from baram_spark.operators.multimodal import (
        decode_image,
        extract_features,
        image_features,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
    payload = _encode_png(px, ctype=2, filters=[0, 1, 2, 3, 4])
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/png", 12, 12, None)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    row = extract_features(media).collect()[0]
    assert row["ok"] and row["decoded"]
    exp = image_features(decode_image(payload))
    assert np.allclose(np.array(row["feat"]), exp.astype(np.float32))


# -- MP4 container-level frame sampling --------------------------------------

def _build_mp4(samples, timescale=1000, spc=2):
    """Minimal ISO-BMFF file: ftyp + mdat carrying the given sample byte
    strings + a moov with real stts/stsz/stsc/stco tables (chunks of
    ``spc`` samples, 100 ticks per sample)."""
    import struct

    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_payload = b"".join(samples)
    mdat = box(b"mdat", mdat_payload)
    mdat_start = len(ftyp) + 8  # offset of first sample byte in file

    n = len(samples)
    stts = box(b"stts", struct.pack(">II", 0, 1)
               + struct.pack(">II", n, 100))
    stsz = box(b"stsz", struct.pack(">III", 0, 0, n)
               + b"".join(struct.pack(">I", len(s)) for s in samples))
    n_chunks = -(-n // spc)
    stsc = box(b"stsc", struct.pack(">II", 0, 1)
               + struct.pack(">III", 1, spc, 1))
    offs, pos = [], mdat_start
    for c in range(n_chunks):
        offs.append(pos)
        for s in samples[c * spc:(c + 1) * spc]:
            pos += len(s)
    stco = box(b"stco", struct.pack(">II", 0, n_chunks)
               + b"".join(struct.pack(">I", o) for o in offs))
    stbl = box(b"stbl", stts + stsz + stsc + stco)
    minf = box(b"minf", stbl)
    mdhd = box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, timescale, n * 100)
               + struct.pack(">HH", 0x55C4, 0))
    hdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
               + b"\x00" * 12 + b"vid\x00")
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", mdia)
    mvhd = box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, timescale, n * 100)
               + b"\x00" * 80)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def test_parse_mp4_sample_table():
    from baram_spark.operators.multimodal import parse_mp4

    samples = [bytes([i]) * (10 + i) for i in range(7)]
    payload = _build_mp4(samples)
    info = parse_mp4(payload)
    assert info["duration_ms"] == 700
    (trk,) = info["tracks"]
    assert trk["handler"] == "vide" and trk["n_samples"] == 7
    assert len(trk["samples"]) == 7
    for i, (ts, off, sz) in enumerate(trk["samples"]):
        assert ts == i * 100
        assert payload[off:off + sz] == samples[i], i


def test_sample_frames_real_mp4_bytes(spark):
    """MP4 payloads get container-level REAL sampling: the fingerprint is
    the sha256 of the actual coded-sample bytes at the real timestamp
    (decoded=true); non-MP4 payloads keep the stub (decoded=false)."""
    from baram_spark.operators.multimodal import sample_frames

    samples = [bytes([i]) * 64 for i in range(10)]
    payload = _build_mp4(samples)
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(payload), "video/mp4", None, None, 1000),
            (2, "video", bytearray(b"\x00not-an-mp4"), "video/x-fake",
             None, None, 3000),
        ],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    rows = sample_frames(media, every_ms=300, max_frames=8).collect()
    real = [r for r in rows if r["media_id"] == 1]
    stub = [r for r in rows if r["media_id"] == 2]
    assert real and all(r["decoded"] for r in real)
    assert stub and all(not r["decoded"] for r in stub)
    # every real fingerprint is the hash of the ACTUAL nearest sample
    for r in real:
        idx = r["ts_ms"] // 100
        assert r["frame_sha"] == hashlib.sha256(samples[idx]).hexdigest()
        assert r["ts_ms"] % 100 == 0


def test_parse_mp3_frames():
    """Real MPEG-1 Layer III frame-header walk: ID3v2 skipped, CBR and VBR
    frame lengths computed from the bitrate/sample-rate tables, duration
    from samples-per-frame."""
    from baram_spark.operators.multimodal import parse_mp3

    def frame(br_idx, padding=0):
        n = 144 * [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                   256, 320, 0][br_idx] * 1000 // 44100 + padding
        return bytes([0xFF, 0xFB, (br_idx << 4) | (padding << 1), 0x00]) \
            + b"\xAA" * (n - 4)

    id3 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 12]) + b"\x00" * 12
    cbr = id3 + b"".join(frame(9) for _ in range(10))  # 128 kbps
    info = parse_mp3(cbr)
    assert info["n_frames"] == 10
    assert info["sample_rate"] == 44100
    assert info["bitrate_kbps"] == 128 and not info["vbr"]
    assert abs(info["duration_ms"] - 10 * 1152 * 1000 / 44100) <= 1

    vbr = b"".join(frame(9 if i % 2 else 12, padding=i % 2)
                   for i in range(8))
    info = parse_mp3(vbr)
    assert info["n_frames"] == 8 and info["vbr"]
    assert info["vbr_header"] is None

    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_mp3(b"\x00\x01\x02 definitely not audio")


def test_parse_mp3_xing_vbri_headers():
    """Xing/Info/VBRI tag frames: counts parsed from the declared offsets,
    the tag frame excluded from the audio count, header-declared duration
    and byte-derived bitrate winning over the frame walk (they survive
    truncation)."""
    from baram_spark.operators.multimodal import parse_mp3

    def frame(br_idx, first_payload=b""):
        n = 144 * [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                   256, 320, 0][br_idx] * 1000 // 44100
        head = bytes([0xFF, 0xFB, br_idx << 4, 0x00])
        body = first_payload + b"\xAA" * (n - 4 - len(first_payload))
        return head + body

    n_declared, bytes_declared = 500, 800_000
    def tag(name):
        # MPEG1 stereo: tag at offset 32 past the 4-byte header
        return (b"\x00" * 32 + name + (3).to_bytes(4, "big")
                + n_declared.to_bytes(4, "big")
                + bytes_declared.to_bytes(4, "big"))

    xing = frame(9, tag(b"Xing")) + b"".join(frame(9) for _ in range(4))
    info = parse_mp3(xing)
    assert info["vbr_header"] == "Xing" and info["vbr"]
    assert info["header_frames"] == n_declared
    assert info["header_bytes"] == bytes_declared
    assert info["n_frames"] == 4  # tag frame not audio
    exp_ms = n_declared * 1152 * 1000 / 44100
    assert abs(info["duration_ms"] - exp_ms) <= 1
    assert info["bitrate_kbps"] == round(bytes_declared * 8 / exp_ms)

    cbr_info = frame(9, tag(b"Info")) + b"".join(frame(9) for _ in range(4))
    info = parse_mp3(cbr_info)
    assert info["vbr_header"] == "Info" and not info["vbr"]
    assert info["n_frames"] == 4

    vbri_body = (b"\x00" * 32 + b"VBRI" + b"\x00\x01" + b"\x00\x00"
                 + b"\x00\x64" + bytes_declared.to_bytes(4, "big")
                 + n_declared.to_bytes(4, "big"))
    vbri = frame(9, vbri_body) + b"".join(frame(9) for _ in range(3))
    info = parse_mp3(vbri)
    assert info["vbr_header"] == "VBRI" and info["vbr"]
    assert info["header_frames"] == n_declared
    assert info["n_frames"] == 3


def test_audio_metadata_operator(spark):
    """audio_metadata: real WAV + MP3 header parses through the Spark
    surface; unknown containers ok=false."""
    import io as _io
    import wave as _wave

    from baram_spark.operators.multimodal import audio_metadata

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x01" * 8000)  # 1 s
    wav = buf.getvalue()

    def mp3_frame(br_idx=9):
        n = 144 * 128000 // 44100
        return bytes([0xFF, 0xFB, br_idx << 4, 0x00]) + b"\xAA" * (n - 4)

    mp3 = b"".join(mp3_frame() for _ in range(20))
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav), "audio/wav", None, None, None),
            (2, "audio", bytearray(mp3), "audio/mpeg", None, None, None),
            (3, "audio", bytearray(b"junk"), "audio/x", None, None, None),
            (4, "image", bytearray(b"BM.."), "image/bmp", None, None, None),
        ],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    rows = {r["media_id"]: r for r in audio_metadata(media).collect()}
    assert set(rows) == {1, 2, 3}  # images filtered out
    assert rows[1]["container"] == "wav" and rows[1]["ok"]
    assert rows[1]["duration_ms"] == 1000 and rows[1]["sample_rate"] == 8000
    assert rows[2]["container"] == "mp3" and rows[2]["ok"]
    assert rows[2]["bitrate_kbps"] == 128
    assert abs(rows[2]["duration_ms"] - 20 * 1152 * 1000 / 44100) <= 1
    assert not rows[3]["ok"]


def test_mp4_hostile_counts_raise_not_allocate():
    """A corrupt/hostile MP4 declaring 2^32 samples must raise a parse
    error (-> decoded=false tier) instead of materializing a
    multi-gigabyte list and getting the executor OOM-killed."""
    import struct
    import time

    from baram_spark.operators.multimodal import parse_mp4

    def box(name, payload_):
        return struct.pack(">I", 8 + len(payload_)) + name + payload_

    stts = box(b"stts", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
               + struct.pack(">II", 0xFFFFFFFF, 100))
    stsz = box(b"stsz", b"\x00\x00\x00\x00" + struct.pack(">II", 64, 4))
    stco = box(b"stco", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
               + struct.pack(">I", 0))
    stsc = box(b"stsc", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
               + struct.pack(">III", 1, 4, 1))
    stbl = box(b"stbl", stts + stsz + stco + stsc)
    minf = box(b"minf", stbl)
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    mdhd = box(b"mdhd", b"\x00\x00\x00\x00" + b"\x00" * 8
               + struct.pack(">II", 1000, 1000) + b"\x00" * 4)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", mdia)
    mvhd = box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 8
               + struct.pack(">II", 1000, 1000) + b"\x00" * 80)
    moov = box(b"moov", mvhd + trak)
    payload = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov

    t0 = time.time()
    with pytest.raises(ValueError, match="exceeds payload size"):
        parse_mp4(payload)
    assert time.time() - t0 < 2.0  # fails fast, no allocation


def test_jpeg_cmyk_component_count_raises():
    """4-component (Adobe CMYK) JPEGs must raise — decoding them as
    YCbCr produces garbage pixels flagged decoded=true."""
    import struct

    from baram_spark.operators.multimodal import decode_image

    sof = struct.pack(">HBHHB", 8 + 3 * 4, 8, 8, 8, 4)
    for i in range(4):
        sof += bytes([i + 1, 0x11, 0])
    payload = (b"\xff\xd8" + b"\xff\xc0" + sof
               + b"\xff\xda" + struct.pack(">HB", 6 + 2, 1)
               + bytes([1, 0x00]) + bytes([0, 63, 0])
               + b"\x00" * 32 + b"\xff\xd9")
    with pytest.raises(ValueError, match="components unsupported"):
        decode_image(payload)


def test_audio_metadata_mpeg25_no_id3(spark):
    """Tagless MPEG-2.5 Layer III (sync 0xFF 0xE3) must be sniffed as
    mp3 — parse_mp3 fully supports version 2.5 (576 samples/frame)."""
    from baram_spark.operators.multimodal import audio_metadata, parse_mp3

    def frame25(br_idx):
        # MPEG-2.5 Layer III: 0xFF, sync+ver=00+layer=01+no-crc -> 0xE3
        bitrate = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                   144, 160, 0][br_idx] * 1000
        n = 576 // 8 * bitrate // 11025
        return bytes([0xFF, 0xE3, (br_idx << 4) | 0, 0x00]) \
            + b"\xAA" * (n - 4)

    mp3 = b"".join(frame25(9) for _ in range(6))
    info = parse_mp3(mp3)
    assert info["n_frames"] == 6 and info["sample_rate"] == 11025

    media = spark.createDataFrame(
        [(1, "audio", bytearray(mp3), "audio/mpeg", None, None, None)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    row = audio_metadata(media).collect()[0]
    assert row["ok"] and row["container"] == "mp3"
    assert row["sample_rate"] == 11025 and row["n_frames"] == 6
