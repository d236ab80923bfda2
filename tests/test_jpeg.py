"""Baseline-JPEG round trip: a minimal test-side encoder (FDCT + custom
canonical huffman tables + bit stuffing, ITU-T T.81 annex-F structure)
drives the package decoder through 4:4:4, grayscale, 4:2:0 subsampling,
and restart-marker paths. With identity quant tables the only loss is
coefficient rounding, so pixels must round-trip within a small tolerance."""

import struct

import numpy as np

from baram_spark.operators.multimodal import _DCT_C, _ZIGZAG, decode_image

# custom canonical tables: 12 DC size symbols at code length 4,
# 162 AC run/size symbols at code length 8 (Kraft-valid, decoder reads
# them from DHT so they need not be the Annex-K defaults)
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical(symbols, length):
    return {sym: (i, length) for i, sym in enumerate(symbols)}


_DC_CODES = _canonical(_DC_SYMS, 4)
_AC_CODES = _canonical(_AC_SYMS, 8)


def _dht(tc, th, symbols, length):
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    return bytes([(tc << 4) | th] + counts + list(symbols))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # 1-fill padding


def _encode_block(bw, block, pred, q):
    coef = np.round((_DCT_C @ (block - 128.0) @ _DCT_C.T) / q).astype(int)
    zz = coef.reshape(-1)[_ZIGZAG]
    diff = int(zz[0]) - pred
    t = int(abs(diff)).bit_length()
    code, ln = _DC_CODES[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = _AC_CODES[0xF0]
            bw.write(c, l)
            run -= 16
        s = int(abs(v)).bit_length()
        c, l = _AC_CODES[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        c, l = _AC_CODES[0x00]
        bw.write(c, l)
    return int(zz[0])


def encode_jpeg(px, subsample=False, quant=None, restart=0):
    """Encode HxWx3 RGB (or HxW gray) as baseline JPEG."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, float)
    qzz = q.reshape(-1)[_ZIGZAG].astype(int)

    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        if subsample:  # 4:2:0 — chroma = 2x2 mean
            he, we = (h + 1) & ~1, (w + 1) & ~1
            def pad(p):
                return np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
            cb = pad(cb).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            planes, samp = [y, cb, cr], [(2, 2), (1, 1), (1, 1)]
        else:
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                             mode="edge"))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) \
        + bytes(int(x) for x in qzz)
    nc = len(planes)
    sof = struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + sof
    dc = _dht(0, 0, _DC_SYMS, 4)
    ac = _dht(1, 0, _AC_SYMS, 8)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dc) + len(ac)) + dc + ac
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos

    bw = _BitWriter()
    pred = [0] * nc
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            pred = [0] * nc
        my, mx = divmod(mcu, mcux)
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    pred[ci] = _encode_block(
                        bw, p[y0:y0 + 8, x0:x0 + 8], pred[ci], q
                    )
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def test_jpeg_444_roundtrip_near_lossless():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    got = decode_image(encode_jpeg(px))
    assert got.shape == px.shape
    # identity quant: only FDCT rounding + color-space round trip remain
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 4, err.max()


def test_jpeg_grayscale_roundtrip():
    rng = np.random.default_rng(12)
    g = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    got = decode_image(encode_jpeg(g))
    err = np.abs(got[..., 0].astype(int) - g.astype(int))
    assert err.max() <= 2
    assert np.array_equal(got[..., 0], got[..., 1])


def test_jpeg_420_subsampled():
    rng = np.random.default_rng(13)
    # smooth image: subsampled chroma must still reconstruct closely
    base = rng.integers(60, 196, size=(4, 4, 3)).astype(np.float64)
    px = np.clip(
        np.round(
            np.kron(base, np.ones((8, 8, 1)))
        ), 0, 255
    ).astype(np.uint8)[:30, :28]
    got = decode_image(encode_jpeg(px, subsample=True))
    assert got.shape == px.shape
    err = np.abs(got.astype(int) - px.astype(int)).mean()
    assert err <= 3.0, err


def test_jpeg_restart_markers():
    rng = np.random.default_rng(14)
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    plain = decode_image(encode_jpeg(px))
    with_rst = decode_image(encode_jpeg(px, restart=2))
    assert np.array_equal(plain, with_rst)


def test_jpeg_quantization_lossy_but_close():
    rng = np.random.default_rng(15)
    base = rng.integers(0, 256, size=(3, 3, 3)).astype(np.float64)
    px = np.clip(np.kron(base, np.ones((8, 8, 1))), 0, 255).astype(np.uint8)
    q = np.full((8, 8), 8.0)
    got = decode_image(encode_jpeg(px, quant=q))
    psnr = 10 * np.log10(
        255.0 ** 2 / max(((got.astype(float) - px) ** 2).mean(), 1e-9)
    )
    assert psnr > 30, psnr


def test_jpeg_flows_through_feature_pipeline(spark):
    from baram_spark.operators.multimodal import extract_features

    rng = np.random.default_rng(16)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = encode_jpeg(px)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/jpeg", 16, 16, None)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    row = extract_features(media).collect()[0]
    assert row["ok"] and row["decoded"]
