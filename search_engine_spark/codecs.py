"""Posting-list compression codecs (pure Python/numpy, no Spark).

Byte-layout-compatible re-implementations of the reference engine's codecs
(semantics derived from /root/reference/component/utils/encoding.h:48-162,
encoding.cpp:11-128 and BitStream.cpp — studied, not copied):

* ``var_byte_encode`` — 7-bit groups little-endian; the HIGH BIT SET marks
  the LAST byte (inverted vs classic VByte continuation).
* ``bit_packing`` — header ``[u8 width][u64 length]`` then values stored
  byte-ALIGNED at 8/16/32/64-bit granularity chosen by max bit width.
  Empty input encodes as a single ``0x00`` byte.
* ``simple9`` — length prefix (varbyte), then 32-bit words: 4-bit selector
  in the LOW bits, payload values packed low-to-high above it. 9 selector
  classes (28x1 ... 1x28).
* ``delta_encode`` (v1) — varbyte base + bit-packed gaps.
* ``delta_encode_v2`` — varbyte base + Simple9 gaps (final-index docIDs).
* ``encode_chunk`` / ``decode_chunk`` — one <=128-posting chunk:
  delta_v2(doc_ids) + bit_packing(tfs). Identical layout to the reference's
  ``BlockBinaryEncoder::encode_chunk`` (BlockEncoder.cpp:112-122).

All integers little-endian. Values passed to Simple9 must fit in 28 bits;
``encode_chunk`` transparently falls back to a varbyte-gap codec (codec id
``CODEC_VB_FALLBACK``) when a doc-id gap exceeds 2^28-1 (possible at
10^12-doc scale with sparse terms) — the codec id is stored out-of-band in
the chunk table, so the common-case payload stays reference-identical.

These run inside Arrow-batched pandas UDFs; per-chunk numpy keeps the work
vectorized at the 128-posting granularity.
"""

from __future__ import annotations

import numpy as np

CHUNK_LENGTH = 128  # postings per compressed chunk (reference default)

SIMPLE9_MAX = (1 << 28) - 1

# (nitems, nbits) per selector, classic Simple9 table.
_SELECTORS = (
    (28, 1),
    (14, 2),
    (9, 3),
    (7, 4),
    (5, 5),
    (4, 7),
    (3, 9),
    (2, 14),
    (1, 28),
)

CODEC_SIMPLE9 = 0  # reference-identical: delta base + simple9 gaps
CODEC_VB_FALLBACK = 1  # delta base + varbyte gaps (gaps > 2^28-1)


# ---------------------------------------------------------------- varbyte

def var_byte_encode(num: int, out: bytearray) -> None:
    """Append varbyte encoding of ``num`` (high bit set on last byte)."""
    if num < 0:
        raise ValueError("varbyte requires non-negative integers")
    while num > 0x7F:
        out.append(num & 0x7F)
        num >>= 7
    out.append(num | 0x80)


def var_byte_decode(buf: bytes | memoryview, pos: int) -> tuple[int, int]:
    """Decode one varbyte int starting at ``pos``; return (value, new_pos)."""
    out = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        out |= (byte & 0x7F) << shift
        shift += 7
        if byte & 0x80:
            return out, pos


def var_byte_encode_array(nums: np.ndarray, out: bytearray) -> None:
    for n in nums.tolist():
        var_byte_encode(int(n), out)


def var_byte_decode_array(
    buf: bytes | memoryview, pos: int, count: int
) -> tuple[np.ndarray, int]:
    vals = np.empty(count, dtype=np.uint64)
    for i in range(count):
        v, pos = var_byte_decode(buf, pos)
        vals[i] = v
    return vals, pos


# ------------------------------------------------------------ bit packing

def _width(num: int) -> int:
    return int(num).bit_length()


def bit_packing(nums: np.ndarray, out: bytearray) -> None:
    """Byte-aligned 'bit packing': u8 width, u64 count, fixed-width values."""
    n = len(nums)
    if n == 0:
        out.append(0)
        return
    arr = np.asarray(nums, dtype=np.uint64)
    width = max(1, _width(int(arr.max())))
    out.append(width)
    out += int(n).to_bytes(8, "little")
    if width <= 8:
        out += arr.astype("<u1").tobytes()
    elif width <= 16:
        out += arr.astype("<u2").tobytes()
    elif width <= 32:
        out += arr.astype("<u4").tobytes()
    else:
        out += arr.astype("<u8").tobytes()


def bit_packing_decode(
    buf: bytes | memoryview, pos: int
) -> tuple[np.ndarray, int]:
    width = buf[pos]
    pos += 1
    if width == 0:
        return np.empty(0, dtype=np.uint64), pos
    n = int.from_bytes(bytes(buf[pos : pos + 8]), "little")
    pos += 8
    if width <= 8:
        nbytes, dt = n, "<u1"
    elif width <= 16:
        nbytes, dt = 2 * n, "<u2"
    elif width <= 32:
        nbytes, dt = 4 * n, "<u4"
    else:
        nbytes, dt = 8 * n, "<u8"
    vals = np.frombuffer(bytes(buf[pos : pos + nbytes]), dtype=dt).astype(
        np.uint64
    )
    return vals, pos + nbytes


# ---------------------------------------------------------------- simple9

def simple9_encode(nums: np.ndarray, out: bytearray) -> None:
    """Varbyte length prefix + 32-bit packed words (selector in low 4 bits)."""
    arr = np.asarray(nums, dtype=np.uint64)
    n = len(arr)
    var_byte_encode(n, out)
    if n and int(arr.max()) > SIMPLE9_MAX:
        raise OverflowError("simple9 value exceeds 28 bits")
    vals = arr.tolist()
    index = 0
    while index < n:
        for selector, (nitems_max, nbits) in enumerate(_SELECTORS):
            limit = (1 << nbits) - 1
            data = selector
            shift = 4
            nitems = 0
            i = index
            while i < n and nitems < nitems_max and vals[i] <= limit:
                data |= vals[i] << shift
                shift += nbits
                nitems += 1
                i += 1
            if nitems == nitems_max or index + nitems == n:
                out += (data & 0xFFFFFFFF).to_bytes(4, "little")
                index += nitems
                break


def simple9_decode(
    buf: bytes | memoryview, pos: int
) -> tuple[np.ndarray, int]:
    n, pos = var_byte_decode(buf, pos)
    if n == 0:
        return np.empty(0, dtype=np.uint64), pos
    vals = np.empty(n, dtype=np.uint64)
    filled = 0
    while filled < n:
        data = int.from_bytes(bytes(buf[pos : pos + 4]), "little")
        pos += 4
        nitems_max, nbits = _SELECTORS[data & 0xF]
        data >>= 4
        mask = (1 << nbits) - 1
        for _ in range(nitems_max):
            vals[filled] = data & mask
            filled += 1
            if filled == n:
                break
            data >>= nbits
    return vals, pos


# ------------------------------------------------------------ delta codecs

def delta_encode(nums: np.ndarray, out: bytearray) -> None:
    """v1: varbyte base + bit-packed gaps (intermediate-run layout)."""
    arr = np.asarray(nums, dtype=np.uint64)
    if len(arr) == 0:
        raise ValueError("delta_encode requires non-empty input")
    var_byte_encode(int(arr[0]), out)
    bit_packing(np.diff(arr), out)


def delta_decode(buf: bytes | memoryview, pos: int) -> tuple[np.ndarray, int]:
    base, pos = var_byte_decode(buf, pos)
    gaps, pos = bit_packing_decode(buf, pos)
    vals = np.empty(len(gaps) + 1, dtype=np.uint64)
    vals[0] = base
    if len(gaps):
        vals[1:] = gaps
        np.cumsum(vals, out=vals)
    return vals, pos


def delta_encode_v2(nums: np.ndarray, out: bytearray) -> None:
    """v2: varbyte base + Simple9 gaps (final-index docID layout)."""
    arr = np.asarray(nums, dtype=np.uint64)
    if len(arr) == 0:
        raise ValueError("delta_encode_v2 requires non-empty input")
    var_byte_encode(int(arr[0]), out)
    simple9_encode(np.diff(arr), out)


def delta_decode_v2(
    buf: bytes | memoryview, pos: int
) -> tuple[np.ndarray, int]:
    base, pos = var_byte_decode(buf, pos)
    gaps, pos = simple9_decode(buf, pos)
    vals = np.empty(len(gaps) + 1, dtype=np.uint64)
    vals[0] = base
    if len(gaps):
        vals[1:] = gaps
        np.cumsum(vals, out=vals)
    return vals, pos


# ------------------------------------------------------------ chunk codec

def encode_chunk(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[int, bytes]:
    """Encode one chunk of <=CHUNK_LENGTH postings.

    Returns (codec_id, payload). codec_id CODEC_SIMPLE9 payloads are
    byte-identical to the reference ``encode_chunk`` layout; the varbyte
    fallback handles >28-bit doc-id gaps at extreme scale.
    """
    ids = np.asarray(doc_ids, dtype=np.uint64)
    out = bytearray()
    if len(ids) > 1 and int(np.diff(ids).max()) > SIMPLE9_MAX:
        var_byte_encode(int(ids[0]), out)
        var_byte_encode(len(ids) - 1, out)
        var_byte_encode_array(np.diff(ids), out)
        bit_packing(np.asarray(tfs, dtype=np.uint64), out)
        return CODEC_VB_FALLBACK, bytes(out)
    delta_encode_v2(ids, out)
    bit_packing(np.asarray(tfs, dtype=np.uint64), out)
    return CODEC_SIMPLE9, bytes(out)


def decode_chunk(
    payload: bytes | memoryview, codec: int = CODEC_SIMPLE9
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one chunk -> (doc_ids, tfs), inverse of ``encode_chunk``."""
    if codec == CODEC_SIMPLE9:
        ids, pos = delta_decode_v2(payload, 0)
    elif codec == CODEC_VB_FALLBACK:
        base, pos = var_byte_decode(payload, 0)
        ngaps, pos = var_byte_decode(payload, pos)
        gaps, pos = var_byte_decode_array(payload, pos, ngaps)
        ids = np.empty(ngaps + 1, dtype=np.uint64)
        ids[0] = base
        if ngaps:
            ids[1:] = gaps
            np.cumsum(ids, out=ids)
    else:
        raise ValueError(f"unknown codec id {codec}")
    tfs, pos = bit_packing_decode(payload, pos)
    return ids, tfs


def encode_lengths(doc_lengths: np.ndarray) -> bytes:
    """Bit-pack the per-posting doc_length column stored alongside a chunk.

    Denormalizing doc_length into the posting chunk removes the query-time
    join against the (huge) doc table — the key deviation from the
    reference's MongoDB doc-table lookup, chosen for cluster-scale BM25.
    """
    out = bytearray()
    bit_packing(np.asarray(doc_lengths, dtype=np.uint64), out)
    return bytes(out)


def decode_lengths(payload: bytes | memoryview) -> np.ndarray:
    vals, _ = bit_packing_decode(payload, 0)
    return vals
