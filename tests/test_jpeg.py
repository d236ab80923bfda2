"""Baseline-JPEG round trip: a minimal test-side encoder (FDCT + custom
canonical huffman tables + bit stuffing, ITU-T T.81 annex-F structure)
drives the package decoder through 4:4:4, grayscale, 4:2:0 subsampling,
and restart-marker paths. With identity quant tables the only loss is
coefficient rounding, so pixels must round-trip within a small tolerance."""

import struct

import numpy as np

from baram_spark.operators.multimodal import _DCT_C, _ZIGZAG, decode_image

# custom canonical tables: 12 DC size symbols at code length 4,
# 176 AC run/size symbols at code length 8 (Kraft-valid, decoder reads
# them from DHT so they need not be the Annex-K defaults). EOB(n) symbols
# (r<<4)|0 for r=1..14 serve the progressive encoder's EOB runs.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [(r << 4) for r in range(1, 15)]


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


def _component_setup(px, subsample):
    """Shared encoder front half: color transform, sampling factors,
    padded planes, and per-component quantized zigzag coefficient grids
    over the padded MCU block layout."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes, samp = [px.astype(np.float64)], [(1, 1)]
    else:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        if subsample:
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
    grids = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                    mode="edge")
        grids.append(pp)
    return samp, grids, hmax, vmax, mcux, mcuy


def _coef_grids(grids, q):
    """FDCT + quantize every padded 8x8 block → (by, bx, 64) zigzag ints."""
    out = []
    for pp in grids:
        by, bx = pp.shape[0] // 8, pp.shape[1] // 8
        coefs = np.zeros((by, bx, 64), dtype=np.int64)
        for yy in range(by):
            for xx in range(bx):
                blk = pp[yy * 8:yy * 8 + 8, xx * 8:xx * 8 + 8]
                c = np.round((_DCT_C @ (blk - 128.0) @ _DCT_C.T) / q)
                coefs[yy, xx] = c.reshape(-1)[_ZIGZAG].astype(np.int64)
        out.append(coefs)
    return out


def _emit_mag(bw, v):
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


class _ProgAcWriter:
    """AC scan emitter with EOB-run accumulation (first + refine)."""

    def __init__(self, bw):
        self.bw = bw
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def flush_eob(self):
        if self.eobrun == 0 and not self.pending_bits:
            return
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            c, ln = _AC_CODES[r << 4]
            self.bw.write(c, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
        for b in self.pending_bits:
            self.bw.write(b, 1)
        self.eobrun = 0
        self.pending_bits = []

    def first_block(self, band, al):
        """Encode one block's [ss, se] band in an AC-first scan."""
        scaled = [int(v) // (1 << al) if v >= 0 else -((-int(v)) >> al)
                  for v in band]
        if not any(scaled):
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eob()
            return
        self.flush_eob()
        run = 0
        last = max(i for i, v in enumerate(scaled) if v)
        for i, v in enumerate(scaled):
            if i > last:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = _AC_CODES[0xF0]
                self.bw.write(c, ln)
                run -= 16
            s, mag = _emit_mag(self.bw, v)
            c, ln = _AC_CODES[(run << 4) | s]
            self.bw.write(c, ln)
            self.bw.write(mag, s)
            run = 0
        if last < len(scaled) - 1:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eob()

    def refine_block(self, band, al):
        """Encode one block's band in an AC-refine scan (T.81 G.1.2.3 /
        libjpeg encode_mcu_AC_refine): correction bits for coefficients
        already significant at Ah=al+1, newly-significant at Al=al."""
        absv = [abs(int(v)) >> al for v in band]
        eob = 0
        for i, t in enumerate(absv):
            if t == 1:
                eob = i + 1  # position past the last newly-significant
        run = 0
        br: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            while run > 15 and i < eob:
                self.flush_eob()
                c, ln = _AC_CODES[0xF0]
                self.bw.write(c, ln)
                run -= 16
                for b in br:
                    self.bw.write(b, 1)
                br = []
            if t > 1:  # history-nonzero: one correction bit
                br.append(t & 1)
                continue
            # newly significant
            self.flush_eob()
            c, ln = _AC_CODES[(run << 4) | 1]
            self.bw.write(c, ln)
            self.bw.write(1 if band[i] >= 0 else 0, 1)
            for b in br:
                self.bw.write(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            self.eobrun += 1
            self.pending_bits.extend(br)
            if self.eobrun == 0x7FFF:
                self.flush_eob()


def encode_jpeg_progressive(px, subsample=False, quant=None,
                            al_dc=1, al_ac=1, bands=((1, 5), (6, 63))):
    """Progressive (SOF2) encoder: interleaved DC-first at Al=al_dc plus
    DC-refine scans down to bit 0, then per-component AC-first scans per
    spectral band at Al=al_ac plus AC-refine scans down to bit 0."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, float)
    qzz = q.reshape(-1)[_ZIGZAG].astype(int)
    samp, grids, hmax, vmax, mcux, mcuy = _component_setup(px, subsample)
    coefs = _coef_grids(grids, q)
    nc = len(coefs)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) \
        + bytes(int(x) for x in qzz)
    sof = struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc2" + sof  # SOF2: progressive
    dc = _dht(0, 0, _DC_SYMS, 4)
    ac = _dht(1, 0, _AC_SYMS, 8)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dc) + len(ac)) + dc + ac

    def sos(comp_ids, ss, se, ah, al):
        seg = struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid in comp_ids:
            seg += bytes([cid, 0x00])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + seg

    # scan 1: interleaved DC first at Al=al_dc
    out += sos(list(range(1, nc + 1)), 0, 0, 0, al_dc)
    bw = _BitWriter()
    pred = [0] * nc
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (sh, sv) in enumerate(samp):
            for by in range(sv):
                for bx in range(sh):
                    dc_v = int(coefs[ci][my * sv + by, mx * sh + bx][0])
                    # spec: DC first codes diff of dc/2^Al (arith shift)
                    scaled = dc_v >> al_dc
                    diff = scaled - pred[ci]
                    pred[ci] = scaled
                    t, mag = _emit_mag(bw, diff)
                    c, ln = _DC_CODES[t]
                    bw.write(c, ln)
                    if t:
                        bw.write(mag, t)
    bw.flush()
    out += bw.out

    # DC refine scans, bit al_dc-1 .. 0 (interleaved, one raw bit/block)
    for bit in range(al_dc - 1, -1, -1):
        out += sos(list(range(1, nc + 1)), 0, 0, bit + 1, bit)
        bw = _BitWriter()
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        dc_v = int(coefs[ci][my * sv + by, mx * sh + bx][0])
                        bw.write((dc_v >> bit) & 1, 1)
        bw.flush()
        out += bw.out

    # per-component AC scans over the COMPONENT block grid (no padding)
    for ci, (sh, sv) in enumerate(samp):
        cw = -(-(w * sh) // hmax)
        chh = -(-(h * sv) // vmax)
        bwid, bhgt = -(-cw // 8), -(-chh // 8)
        blocks = [coefs[ci][yy, xx]
                  for yy in range(bhgt) for xx in range(bwid)]
        for ss, se in bands:
            out += sos([ci + 1], ss, se, 0, al_ac)
            bw = _BitWriter()
            wr = _ProgAcWriter(bw)
            for blk in blocks:
                wr.first_block(blk[ss:se + 1], al_ac)
            wr.flush_eob()
            bw.flush()
            out += bw.out
        for bit in range(al_ac - 1, -1, -1):
            for ss, se in bands:
                out += sos([ci + 1], ss, se, bit + 1, bit)
                bw = _BitWriter()
                wr = _ProgAcWriter(bw)
                for blk in blocks:
                    wr.refine_block(blk[ss:se + 1], bit)
                wr.flush_eob()
                bw.flush()
                out += bw.out
    out += b"\xff\xd9"
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


def test_jpeg_progressive_444_roundtrip():
    """Progressive SOF2: DC first + DC refine, per-component spectral AC
    bands with EOB runs, AC successive-approximation refine — decoded
    pixels match the source within the same rounding budget as baseline."""
    rng = np.random.default_rng(21)
    px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    got = decode_image(encode_jpeg_progressive(px))
    assert got.shape == px.shape
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 4, err.max()
    # and the progressive scans reconstruct EXACTLY what one baseline
    # sequential scan of the same coefficients does
    base = decode_image(encode_jpeg(px))
    assert np.array_equal(got, base)


def test_jpeg_progressive_420_noninterleaved_grid():
    """4:2:0 progressive: AC scans walk the COMPONENT's own block grid
    (ceil(comp px/8)) which differs from the padded MCU grid for luma —
    the overlap of interleaved DC scans and non-interleaved AC scans is
    the classic progressive-decoder bug surface."""
    rng = np.random.default_rng(22)
    base = rng.integers(60, 196, size=(4, 4, 3)).astype(np.float64)
    px = np.clip(np.round(np.kron(base, np.ones((8, 8, 1)))),
                 0, 255).astype(np.uint8)[:30, :28]  # odd vs 16-px MCUs
    got = decode_image(encode_jpeg_progressive(px, subsample=True))
    assert got.shape == px.shape
    err = np.abs(got.astype(int) - px.astype(int)).mean()
    assert err <= 3.0, err


def test_jpeg_progressive_gray_deep_approximation():
    """Grayscale with 2 bits of successive approximation on DC and AC
    (three scan levels) and a 3-way spectral split."""
    rng = np.random.default_rng(23)
    g = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload = encode_jpeg_progressive(
        g, al_dc=2, al_ac=2, bands=((1, 2), (3, 20), (21, 63))
    )
    got = decode_image(payload)
    base = decode_image(encode_jpeg(g))
    assert np.array_equal(got, base)


def test_jpeg_progressive_quantized():
    """Coarse quantization creates long zero runs and cross-block EOB
    runs in every band — the EOBRUN bookkeeping path."""
    rng = np.random.default_rng(24)
    base = rng.integers(0, 256, size=(3, 3, 3)).astype(np.float64)
    px = np.clip(np.kron(base, np.ones((8, 8, 1))), 0, 255).astype(np.uint8)
    q = np.full((8, 8), 8.0)
    got = decode_image(encode_jpeg_progressive(px, quant=q))
    seq = decode_image(encode_jpeg(px, quant=q))
    assert np.array_equal(got, seq)


def test_jpeg_progressive_flows_through_feature_pipeline(spark):
    from baram_spark.operators.multimodal import extract_features

    rng = np.random.default_rng(25)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(px)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/jpeg", 16, 16, None)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    row = extract_features(media).collect()[0]
    assert row["ok"] and row["decoded"]


# -- property-based (hypothesis) --------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.integers(min_value=1, max_value=24),   # height
    st.integers(min_value=1, max_value=24),   # width
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.sampled_from([0, 1, 2]),               # al levels for dc/ac
)
@settings(max_examples=25, deadline=None)
def test_progressive_equals_sequential_property(h, w, seed, al):
    """For any image size (odd dims, tiny images, single pixels) and any
    successive-approximation depth, the progressive scan script must
    reconstruct EXACTLY the same pixels as one sequential scan."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    prog = decode_image(encode_jpeg_progressive(px, al_dc=al, al_ac=al))
    seq = decode_image(encode_jpeg(px))
    assert np.array_equal(prog, seq), (h, w, al)
