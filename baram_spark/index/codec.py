"""Posting-list codec: docID delta + varint / bit-packed FOR, skip pointers,
per-block max-score metadata.

The reference delegates the physical index to Lucene via OpenSearch; this is
the from-scratch PySpark-native replacement specified by the north_star:
per-term posting lists compressed as docID deltas (LEB128 varint;
frame-of-reference bit packing — exception-free, cheap when deltas within a
128-block are near-uniform; or PForDelta proper, CODEC_PFOR, whose patched
exceptions keep one huge gap from inflating the whole block's width), skip
pointers every ``BLOCK`` postings, and a per-block score upper bound
(max of ``tf / (tf + k1*(1-b+b*dl/avgdl))``) enabling Block-Max WAND.

Everything is numpy-vectorized — no per-posting Python loops; the only
Python-level loop is over 128-entry blocks during final blob assembly.

Blob formats (all little-endian):

``postings_blob``:
    [codec_id: u8] then per block:
      varint(count) + encoded docid deltas + encoded tfs + encoded dls
    (dl = analyzed field length of the doc — stored per posting, like
    Lucene norms, so a shard scores BM25 self-contained with no doc-stats
    join at query time)
    For codec VARINT deltas/tfs are LEB128 varints; for codec FOR each
    section is [width: u8][packed bits] frame-of-reference packed.
    First delta of block b is relative to last docID of block b-1
    (relative to -1 for block 0, i.e. stored as docid+1... see encode).

``skips_blob``:  int64 array: [n_blocks, last_docid_0.., offset_0..,
                 count_0..] (offset = byte offset of block start in
                 postings_blob, enabling O(1) block seek).

``blockmax_blob``: float32 array, one score bound per block.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
CODEC_VARINT = 0
CODEC_FOR = 1
CODEC_PFOR = 2


# --- vectorized LEB128 varint ----------------------------------------------

def varint_encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode uint64 array as concatenated LEB128 varints.

    Returns (buffer, per-value byte lengths) — lengths let callers slice the
    stream at value boundaries without re-scanning.
    """
    v = values.astype(np.uint64, copy=True)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # byte length = ceil(bit_length / 7), min 1
    bits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nonzero = tmp != 0
        if not nonzero.any():
            break
        bits[nonzero] += 1
        tmp >>= np.uint64(7)
    lengths = np.maximum(bits, 1)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    # fill byte position k for every value with length > k
    shifted = v.copy()
    max_len = int(lengths.max())
    for k in range(max_len):
        mask = lengths > k
        pos = offsets[:-1][mask] + k
        byte = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (lengths[mask] > k + 1).astype(np.uint8) << 7
        out[pos] = byte | cont
        shifted[mask] >>= np.uint64(7)
    return out.tobytes(), lengths


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a concatenated LEB128 stream to uint64 (fully vectorized)."""
    raw = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    if raw.size == 0:
        return np.zeros(0, dtype=np.uint64)
    payload = (raw & 0x7F).astype(np.uint64)
    terminator = (raw & 0x80) == 0
    # group id per byte: 0-based index of the varint this byte belongs to
    group = np.zeros(raw.size, dtype=np.int64)
    group[1:] = np.cumsum(terminator)[:-1]
    # shift within group = byte position within its varint * 7
    starts = np.zeros(raw.size, dtype=np.int64)
    term_idx = np.flatnonzero(terminator)
    # position within group: index - start_of_group
    group_starts = np.concatenate(([0], term_idx[:-1] + 1))
    pos_in_group = np.arange(raw.size) - group_starts[group]
    vals = payload << (pos_in_group.astype(np.uint64) * np.uint64(7))
    out = np.zeros(term_idx.size, dtype=np.uint64)
    np.add.at(out, group, vals)
    if count is not None:
        out = out[:count]
    return out


# --- frame-of-reference bit packing (PForDelta-style, exception-free) ------

# thresholds for vectorized bit_length: bl(v) = searchsorted(right)
_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)
# exception-cost matrix for pfor width choice: LEB128 bytes of the high
# part of a bl-bit value patched at width w (0 where bl <= w)
_PFOR_EXC = np.maximum(
    (np.arange(65)[None, :] - np.arange(65)[:, None] + 6) // 7, 0
)


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Per-value bit length of a uint64 array (min 1), no Python loop."""
    return np.maximum(np.searchsorted(_POW2, v, side="right"), 1)


def _pack_bits(v: np.ndarray, width: int) -> bytes:
    """Expand each value into `width` bits (LSB first), then packbits —
    THE one copy of the packed-section layout (FOR and PFOR share it)."""
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _unpack_bits(buf, n: int, width: int, offset: int) -> np.ndarray:
    """Inverse of _pack_bits over ``buf[offset:]``."""
    nbytes = (n * width + 7) // 8
    packed = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=offset)
    bits = np.unpackbits(packed, bitorder="little")[: n * width]
    shifts = np.arange(width, dtype=np.uint64)
    return (bits.reshape(n, width).astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64
    )


def for_encode(values: np.ndarray) -> bytes:
    """[width:u8][n:u32][packed bits] — fixed-width pack of a uint64 array."""
    v = values.astype(np.uint64)
    n = v.size
    width = 1 if n == 0 else max(1, int(v.max()).bit_length())
    header = bytes([width]) + np.uint32(n).tobytes()
    if n == 0:
        return header
    return header + _pack_bits(v, width)


def for_decode(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Inverse of for_encode; returns (values, bytes consumed incl. header)."""
    width = buf[offset]
    n = int(np.frombuffer(buf, dtype=np.uint32, count=1, offset=offset + 1)[0])
    nbytes = (n * width + 7) // 8
    if n == 0:
        return np.zeros(0, dtype=np.uint64), 5
    return _unpack_bits(buf, n, width, offset + 5), 5 + nbytes


# --- patched frame-of-reference (PForDelta WITH exceptions) -----------------

def pfor_encode(values: np.ndarray) -> bytes:
    """[width:u8][n:u32][n_exc:u16][packed low bits][exc pos:u8..][exc high:varints]

    Classic PForDelta: the base width ``w`` covers the common case and
    outliers are PATCHED — their low ``w`` bits ride the packed section,
    positions and the shifted-out high bits ride an exception list. The
    width is chosen by exact cost (packed bytes + per-exception position
    byte + LEB128 bytes of each high part, minimized over all candidate
    widths via the bit-length histogram), so a single huge delta no longer
    inflates every value's width the way exception-free FOR does — the
    docID-gap distribution of a Zipf posting list is exactly that shape
    (many small gaps, a few enormous ones). Positions are u8, so callers
    keep sections at <= 256 values (posting blocks are BLOCK=128).
    """
    v = values.astype(np.uint64)
    n = v.size
    if n == 0:
        return bytes([1]) + np.uint32(0).tobytes() + np.uint16(0).tobytes()
    if n > 256:
        raise ValueError("pfor section exceeds 256 values (u8 positions)")
    # bit length per value (>=1 so zeros pack into width-1 sections);
    # exact cost per candidate width from the bit-length HISTOGRAM —
    # O(n + 64^2), constant numpy-dispatch count (this runs ~3x per
    # 128-block on the index-build hot path)
    bl = _bit_lengths(v)
    max_w = int(bl.max())
    cnt = np.bincount(bl, minlength=65).astype(np.int64)
    widths = np.arange(1, max_w + 1)
    n_exc_per_w = (cnt[None, 1:] * (np.arange(1, 65)[None, :]
                                    > widths[:, None])).sum(axis=1)
    exc_leb = (cnt[None, 1:65] * _PFOR_EXC[1:max_w + 1, 1:65]).sum(axis=1)
    costs = (n * widths + 7) // 8 + n_exc_per_w + exc_leb
    w = 1 + int(np.argmin(costs))
    exc_mask = bl > w
    n_e = int(exc_mask.sum())
    low = v & ((np.uint64(1) << np.uint64(w)) - np.uint64(1)) if w < 64 else v
    packed = _pack_bits(low, w)
    header = bytes([w]) + np.uint32(n).tobytes() + np.uint16(n_e).tobytes()
    if not n_e:
        return header + packed
    pos = np.flatnonzero(exc_mask).astype(np.uint8).tobytes()
    high = (v[exc_mask] >> np.uint64(w)) if w < 64 else np.zeros(n_e, np.uint64)
    high_buf, _ = varint_encode(high)
    return header + packed + pos + high_buf


def pfor_decode(buf: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Inverse of pfor_encode; returns (values, bytes consumed)."""
    w = buf[offset]
    n = int(np.frombuffer(buf, dtype=np.uint32, count=1, offset=offset + 1)[0])
    n_e = int(np.frombuffer(buf, dtype=np.uint16, count=1, offset=offset + 5)[0])
    pos = offset + 7
    if n == 0:
        return np.zeros(0, dtype=np.uint64), 7
    values = _unpack_bits(buf, n, w, pos)
    pos += (n * w + 7) // 8
    if n_e:
        epos = np.frombuffer(buf, dtype=np.uint8, count=n_e, offset=pos)
        pos += n_e
        # high parts: n_e terminated LEB128 varints — find the span by
        # counting terminator bytes (each value <= 64 bits -> <= 10 bytes)
        raw = np.frombuffer(buf, dtype=np.uint8,
                            count=min(len(buf) - pos, n_e * 10), offset=pos)
        term = np.flatnonzero((raw & 0x80) == 0)
        span = int(term[n_e - 1]) + 1
        high = varint_decode(raw[:span], count=n_e)
        values[epos] |= high << np.uint64(w)
        pos += span
    return values, pos - offset


# --- posting list encode/decode --------------------------------------------

def bm25_tf_norm(tfs: np.ndarray, dls: np.ndarray, avgdl,
                 k1: float = 1.2, b: float = 0.75) -> np.ndarray:
    """Per-posting BM25 tf component: tf / (tf + k1*(1-b+b*dl/avgdl)).

    THE one copy of this float64 expression — pack-time block-max bounds
    and query-time scoring must be bit-identical, so every caller
    (encode_postings, encode_many, wand.TermPostings) routes through
    here. ``avgdl`` may be a scalar or a per-row array."""
    tfs = tfs.astype(np.float64)
    avgdl_f = np.asarray(avgdl, dtype=np.float64)
    norm = k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl_f)
    return tfs / (tfs + norm)


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    codec: int = CODEC_VARINT,
) -> tuple[bytes, bytes, bytes]:
    """Pack one term's postings (doc_ids MUST be sorted ascending, unique).

    ``dls`` are per-posting analyzed field lengths; block-max bounds are the
    per-block max of the float64 BM25 tf component (safe upper bounds for
    Block-Max WAND since query-time scoring uses the identical float64 math).
    Returns (postings_blob, skips_blob, blockmax_blob).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        # zero postings → the zero-block triple every decode path (and
        # the WAND zero-block pin) already understands
        return (bytes([codec]),
                np.array([0], dtype=np.int64).tobytes(), b"")
    n_blocks = (n + BLOCK - 1) // BLOCK
    tf_norms = bm25_tf_norm(tfs, dls, avgdl, k1, b)

    # deltas: first of each block relative to last docid of previous block
    # (block 0 relative to -1 => delta = docid + 1, so gaps are >= 1)
    prev = np.empty(n, dtype=np.int64)
    prev[0] = -1
    prev[1:] = doc_ids[:-1]
    deltas = (doc_ids - prev).astype(np.uint64)

    parts: list[bytes] = [bytes([codec])]
    offsets = np.zeros(n_blocks, dtype=np.int64)
    last_ids = np.zeros(n_blocks, dtype=np.int64)
    counts = np.zeros(n_blocks, dtype=np.int64)
    blockmax = np.zeros(n_blocks, dtype=np.float64)
    pos = 1

    if codec == CODEC_VARINT:
        delta_buf, delta_lens = varint_encode(deltas)
        tf_buf, tf_lens = varint_encode(tfs.astype(np.uint64))
        dl_buf, dl_lens = varint_encode(dls.astype(np.uint64))
        d_off = np.concatenate(([0], np.cumsum(delta_lens)))
        t_off = np.concatenate(([0], np.cumsum(tf_lens)))
        l_off = np.concatenate(([0], np.cumsum(dl_lens)))
        for bidx in range(n_blocks):
            lo, hi = bidx * BLOCK, min((bidx + 1) * BLOCK, n)
            cnt_bytes, _ = varint_encode(np.array([hi - lo], dtype=np.uint64))
            block = (cnt_bytes + delta_buf[d_off[lo]:d_off[hi]]
                     + tf_buf[t_off[lo]:t_off[hi]] + dl_buf[l_off[lo]:l_off[hi]])
            offsets[bidx] = pos
            last_ids[bidx] = doc_ids[hi - 1]
            counts[bidx] = hi - lo
            blockmax[bidx] = float(np.max(tf_norms[lo:hi]))
            parts.append(block)
            pos += len(block)
    elif codec in (CODEC_FOR, CODEC_PFOR):
        enc = for_encode if codec == CODEC_FOR else pfor_encode
        for bidx in range(n_blocks):
            lo, hi = bidx * BLOCK, min((bidx + 1) * BLOCK, n)
            cnt_bytes, _ = varint_encode(np.array([hi - lo], dtype=np.uint64))
            block = (cnt_bytes + enc(deltas[lo:hi])
                     + enc(tfs[lo:hi].astype(np.uint64))
                     + enc(dls[lo:hi].astype(np.uint64)))
            offsets[bidx] = pos
            last_ids[bidx] = doc_ids[hi - 1]
            counts[bidx] = hi - lo
            blockmax[bidx] = float(np.max(tf_norms[lo:hi]))
            parts.append(block)
            pos += len(block)
    else:
        raise ValueError(f"unknown codec {codec}")

    skips = np.concatenate((
        np.array([n_blocks], dtype=np.int64), last_ids, offsets, counts,
    ))
    return b"".join(parts), skips.tobytes(), blockmax.astype(np.float64).tobytes()


def decode_skips(skips_blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(block_last_docids, block_offsets, block_counts)."""
    arr = np.frombuffer(skips_blob, dtype=np.int64)
    nb = int(arr[0])
    return arr[1 : 1 + nb], arr[1 + nb : 1 + 2 * nb], arr[1 + 2 * nb : 1 + 3 * nb]


def decode_blockmax(blockmax_blob: bytes) -> np.ndarray:
    return np.frombuffer(blockmax_blob, dtype=np.float64)


def _decode_one_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        byte = buf[pos]
        result |= (byte & 0x7F) << shift
        pos += 1
        if not byte & 0x80:
            return result, pos
        shift += 7


def decode_block(
    postings_blob: bytes,
    offset: int,
    prev_last_docid: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Decode one block at ``offset`` → (doc_ids, tfs, dls, end_pos)."""
    codec = postings_blob[0]
    mv = memoryview(postings_blob)
    count, pos = _decode_one_varint(mv, offset)
    if codec == CODEC_VARINT:
        # scan `count` delta varints then `count` tf varints; vectorized
        # decode needs the byte span: find it by counting terminator bytes.
        # A block holds <= 2*BLOCK varints of <= 10 bytes, so the scan
        # window is bounded (no full-buffer rescan per block).
        raw = np.frombuffer(postings_blob, dtype=np.uint8)
        window_end = min(raw.size, pos + 3 * count * 10)
        term_flags = (raw[pos:window_end] & 0x80) == 0
        ends = np.flatnonzero(term_flags)
        span_end = pos + int(ends[3 * count - 1]) + 1
        section = raw[pos:span_end]
        vals = varint_decode(section)
        deltas, tfs, dls = vals[:count], vals[count : 2 * count], vals[2 * count : 3 * count]
        pos = span_end
    elif codec in (CODEC_FOR, CODEC_PFOR):
        dec = for_decode if codec == CODEC_FOR else pfor_decode
        deltas, used = dec(postings_blob, pos)
        pos += used
        tfs, used = dec(postings_blob, pos)
        pos += used
        dls, used = dec(postings_blob, pos)
        pos += used
    else:
        raise ValueError(f"unknown codec {codec}")
    doc_ids = np.cumsum(deltas.astype(np.int64)) + prev_last_docid
    return doc_ids, tfs.astype(np.int64), dls.astype(np.int64), pos


def decode_postings(postings_blob: bytes, skips_blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode the full posting list → (doc_ids, tfs, dls).

    For the varint codec the entire blob past the codec byte is one varint
    stream ([count, deltas.., tfs..] per block), so the whole list decodes
    in a single vectorized pass; block structure is recovered from the skip
    table's per-block counts.
    """
    last_ids, offsets, counts = decode_skips(skips_blob)
    n_blocks = last_ids.size
    empty = np.zeros(0, dtype=np.int64)
    if n_blocks == 0:
        return empty, empty.copy(), empty.copy()
    codec = postings_blob[0]
    if codec == CODEC_VARINT:
        vals = varint_decode(np.frombuffer(postings_blob, dtype=np.uint8)[1:])
        n = int(counts.sum())
        deltas = np.empty(n, dtype=np.uint64)
        tfs = np.empty(n, dtype=np.int64)
        dls = np.empty(n, dtype=np.int64)
        vpos = opos = 0
        for bidx in range(n_blocks):
            c = int(counts[bidx])
            vpos += 1  # skip the count varint
            deltas[opos : opos + c] = vals[vpos : vpos + c]
            tfs[opos : opos + c] = vals[vpos + c : vpos + 2 * c].astype(np.int64)
            dls[opos : opos + c] = vals[vpos + 2 * c : vpos + 3 * c].astype(np.int64)
            vpos += 3 * c
            opos += c
        # per-block delta bases chain continuously, so one global cumsum
        doc_ids = np.cumsum(deltas.astype(np.int64)) - 1
        return doc_ids, tfs, dls
    all_ids, all_tfs, all_dls = [], [], []
    prev = -1
    for bidx in range(n_blocks):
        ids, tfs, dls, _ = decode_block(postings_blob, int(offsets[bidx]), prev)
        all_ids.append(ids)
        all_tfs.append(tfs)
        all_dls.append(dls)
        prev = int(last_ids[bidx])
    return np.concatenate(all_ids), np.concatenate(all_tfs), np.concatenate(all_dls)


# --- batched multi-group encoder (index-build hot path) ---------------------

# varint bytes for block counts 1..BLOCK precomputed (count <= 128)
_COUNT_BYTES = [b""] + [
    bytes([c]) if c < 128 else bytes([(c & 0x7F) | 0x80, c >> 7])
    for c in range(1, BLOCK + 1)
]


def decode_many(blobs, skips_blobs) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch-decode MANY varint posting blobs in ONE vectorized pass.

    The merge side of ``encode_many``: terminated LEB128 streams concatenate
    cleanly, so every blob's payload joins one ``varint_decode`` call and
    per-block delta/tf/dl segments are separated with global index
    arithmetic — no per-blob or per-block Python loops over values (the
    blob-shuffle merge decodes millions of small partials; per-call
    overhead is the entire cost at that shape).

    Returns ``(doc_ids, tfs, dls, dfs)``: the concatenated postings of every
    blob in input order plus the per-blob posting count. Raises ValueError
    for any non-varint blob (callers fall back to decode_postings)."""
    n_blobs = len(blobs)
    e = np.zeros(0, dtype=np.int64)
    if n_blobs == 0:
        return e, e.copy(), e.copy(), e.copy()
    counts_l = []
    dfs = np.empty(n_blobs, dtype=np.int64)
    for i, sk in enumerate(skips_blobs):
        arr = np.frombuffer(sk, dtype=np.int64)
        nb = int(arr[0])
        c = arr[1 + 2 * nb : 1 + 3 * nb]
        counts_l.append(c)
        dfs[i] = int(c.sum())
    payloads = []
    for bl in blobs:
        if bl[0] != CODEC_VARINT:
            raise ValueError("decode_many handles the varint codec only")
        payloads.append(np.frombuffer(bl, dtype=np.uint8)[1:])
    vals = varint_decode(np.concatenate(payloads))

    C = np.concatenate(counts_l).astype(np.int64)  # all blocks, stream order
    if C.size == 0:  # every blob in the batch is zero-block
        return e, e.copy(), e.copy(), dfs
    total = int(C.sum())
    # value-stream layout per block: [1 count][C deltas][C tfs][C dls]
    seg = 1 + 3 * C
    S = np.concatenate(([0], np.cumsum(seg)[:-1]))  # block starts in vals
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(C) - C, C
    )
    base = np.repeat(S + 1, C)
    creps = np.repeat(C, C)
    deltas = vals[base + within]
    tfs = vals[base + creps + within].astype(np.int64)
    dls = vals[base + 2 * creps + within].astype(np.int64)

    # segmented cumsum: delta chains reset at each BLOB boundary. The
    # running sum grows by ~last_doc_id per blob; with hash-range ids
    # (~2^50) a single global cumsum over a very large merge batch could
    # silently wrap int64, so the blob axis is chunked — each chunk's
    # partial sum stays orders of magnitude below 2^63 while the math
    # inside a chunk remains fully vectorized.
    first = np.cumsum(dfs) - dfs  # first posting index of each blob
    doc_ids = np.empty(total, dtype=np.int64)
    CHUNK = 4096  # 4096 × max_doc_id(≈2^50) ≈ 2^62 — safe margin
    for c0 in range(0, n_blobs, CHUNK):
        c1 = min(c0 + CHUNK, n_blobs)
        lo = int(first[c0])
        hi = int(first[c1 - 1] + dfs[c1 - 1])
        if hi == lo:
            continue  # every blob in the chunk is zero-df: nothing to fill
        seg = deltas[lo:hi].astype(np.int64)
        g = np.cumsum(seg)
        # a zero-df blob sitting at the chunk's end would index one past
        # seg; clamp — np.repeat with dfs=0 discards the value anyway
        f_local = np.minimum((first[c0:c1] - lo).astype(np.int64),
                             len(seg) - 1)
        offset = np.repeat(g[f_local] - seg[f_local], dfs[c0:c1])
        doc_ids[lo:hi] = g - offset - 1
    return doc_ids, tfs, dls, dfs


def encode_many(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    avgdl_per_row: np.ndarray,
    k1: float = 1.2,
    b: float = 0.75,
) -> tuple[list, list, list]:
    """Encode MANY posting groups in one vectorized pass (varint codec).

    ``doc_ids[starts[g]:ends[g]]`` is group g, already sorted ascending.
    The three varint streams are produced by single whole-array calls;
    per-group work is pure slicing — this is what makes tens of thousands
    of small terms cheap (no per-group numpy-call overhead).

    Returns (postings_blobs, skips_blobs, blockmax_blobs) lists.
    """
    n = doc_ids.size
    n_groups = starts.size
    doc_ids = doc_ids.astype(np.int64, copy=False)
    if n == 0:
        # all groups empty: one zero-block triple per group (the same
        # representation decode_many's zero-df clamp exists to survive)
        zskip = np.array([0], dtype=np.int64).tobytes()
        return ([bytes([CODEC_VARINT])] * n_groups,
                [zskip] * n_groups, [b""] * n_groups)

    # deltas with reset at group starts (delta = doc_id + 1 there).
    # An EMPTY group has starts[g] == ends[g]; when that offset is n
    # (trailing empty groups) there is no row to reset — writing
    # prev[n-1] = -1 would corrupt the LAST real group's delta chain,
    # so out-of-range starts are dropped, never clamped.
    prev = np.empty(n, dtype=np.int64)
    prev[0] = -1
    prev[1:] = doc_ids[:-1]
    prev[starts[starts < n]] = -1
    deltas = (doc_ids - prev).astype(np.uint64)

    d_buf, d_lens = varint_encode(deltas)
    t_buf, t_lens = varint_encode(tfs.astype(np.uint64))
    l_buf, l_lens = varint_encode(dls.astype(np.uint64))
    d_off = np.concatenate(([0], np.cumsum(d_lens)))
    t_off = np.concatenate(([0], np.cumsum(t_lens)))
    l_off = np.concatenate(([0], np.cumsum(l_lens)))

    # per-row tf norms → per-block maxima via reduceat over block starts
    tfn = bm25_tf_norm(tfs, dls, avgdl_per_row, k1, b)

    blobs: list[bytes] = []
    skips_l: list[bytes] = []
    bmax_l: list[bytes] = []
    header = bytes([CODEC_VARINT])
    d_mv, t_mv, l_mv = memoryview(d_buf), memoryview(t_buf), memoryview(l_buf)
    for g in range(n_groups):
        lo, hi = int(starts[g]), int(ends[g])
        gsize = hi - lo
        n_blocks = (gsize + BLOCK - 1) // BLOCK
        block_starts = lo + np.arange(n_blocks, dtype=np.int64) * BLOCK
        block_ends = np.minimum(block_starts + BLOCK, hi)
        parts = [header]
        offsets = np.empty(n_blocks, dtype=np.int64)
        pos = 1
        for bi in range(n_blocks):
            blo, bhi = int(block_starts[bi]), int(block_ends[bi])
            cnt = _COUNT_BYTES[bhi - blo]
            block = b"".join(
                (
                    cnt,
                    d_mv[d_off[blo]:d_off[bhi]],
                    t_mv[t_off[blo]:t_off[bhi]],
                    l_mv[l_off[blo]:l_off[bhi]],
                )
            )
            offsets[bi] = pos
            pos += len(block)
            parts.append(block)
        blobs.append(b"".join(parts))
        last_ids = doc_ids[block_ends - 1]
        counts = block_ends - block_starts
        skips_l.append(
            np.concatenate(
                (np.array([n_blocks], dtype=np.int64), last_ids, offsets, counts)
            ).tobytes()
        )
        bmax = np.maximum.reduceat(tfn[lo:hi], block_starts - lo)
        bmax_l.append(bmax.astype(np.float64).tobytes())
    return blobs, skips_l, bmax_l
