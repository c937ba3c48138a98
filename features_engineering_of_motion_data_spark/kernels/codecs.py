"""Gorilla-style time-series codecs, fully vectorized in numpy (SURVEY §2.7).

C1 — delta-of-delta timestamp codec (Pelkonen et al., *Gorilla*, VLDB'15
§4.1), adapted from the paper's seconds/14-bit-header scheme to raw int64
microseconds with a 64-bit escape bucket (hour-scale µs gaps exceed the
paper's 32-bit top bucket):

    prefix '0'                     → dod == 0
    prefix '10'    + 7-bit offset  → dod ∈ [−64, 63]
    prefix '110'   + 9-bit offset  → dod ∈ [−256, 255]
    prefix '1110'  + 12-bit offset → dod ∈ [−2048, 2047]
    prefix '11110' + 32-bit offset → dod ∈ [−2³¹, 2³¹−1]
    prefix '11111' + 64-bit        → anything (two's complement, top bit
                                      flipped so it sorts as unsigned)

C2 — XOR float codec (Gorilla §4.2), simplified variant: every non-zero XOR
writes its own explicit window (control '1' + 5-bit clipped leading-zero
count + 6-bit meaningful-length−1 + meaningful bits); control '0' for a zero
XOR. The paper's '10' reuse-previous-window control is a sequential state
machine; dropping it keeps encode/decode branch-free and vectorized at a
compression cost of ≤11 bits per changed value. Deviation documented here
and measured by bench compression-ratio reporting.

Both decoders share a pointer-doubling chase over the per-position code
lengths: L[p] (the code length *if* a code started at bit p) is computable
vectorized from local bits, and the code-start sequence is the orbit of 0
under p → p + L[p], materialized in ⌈log₂ n⌉ gather-compose rounds — no
per-element Python.

Encoded payloads are raw ``bytes``: little-endian int64 count, int64 seed
(t0 / first raw value), then the packed bitstream.
"""

from __future__ import annotations

import numpy as np

_DOD_PAYLOAD = (0, 7, 9, 12, 32, 64)
_DOD_PREFIX_VAL = (0b0, 0b10, 0b110, 0b1110, 0b11110, 0b11111)
_DOD_PREFIX_LEN = (1, 2, 3, 4, 5, 5)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no bitwise_count)."""
    return np.unpackbits(x.astype(np.uint64).view(np.uint8)).reshape(-1, 8 * 8).sum(
        axis=1
    )


def _clz64(x: np.ndarray) -> np.ndarray:
    """Leading-zero count of uint64 (x==0 → 64) via smear + popcount."""
    y = x.astype(np.uint64).copy()
    for s in (1, 2, 4, 8, 16, 32):
        y |= y >> np.uint64(s)
    return 64 - _popcount64(y)


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Trailing-zero count of uint64 (x==0 → 64)."""
    x = x.astype(np.uint64)
    low = (~x) & (x - np.uint64(1))  # ones below lowest set bit; x=0 → all ones
    return _popcount64(low)


def _write_bits(
    total_bits: int,
    offsets: np.ndarray,
    values: np.ndarray,
    lengths: np.ndarray,
) -> np.ndarray:
    """Scatter per-element MSB-first codes (uint64 value, length ≤64 bits)
    into one bool bit array. Vectorized over elements; the only Python loop
    is over distinct code lengths × bit positions (bounded, data-independent)."""
    bits = np.zeros(total_bits, dtype=bool)
    for length in np.unique(lengths):
        if length == 0:
            continue
        sel = lengths == length
        off = offsets[sel]
        val = values[sel]
        for j in range(int(length)):
            bits[off + j] = (val >> np.uint64(length - 1 - j)) & np.uint64(1) != 0
    return bits


def _read_bits(bits: np.ndarray, starts: np.ndarray, length: int) -> np.ndarray:
    """Gather fixed-length MSB-first fields at the given bit offsets."""
    out = np.zeros(len(starts), dtype=np.uint64)
    for j in range(length):
        out = (out << np.uint64(1)) | bits[starts + j].astype(np.uint64)
    return out


def _chase_starts(nxt: np.ndarray, n_codes: int) -> np.ndarray:
    """Orbit of 0 under p → nxt[p], by pointer doubling.

    ``nxt`` must map every position ≥ stream end to itself (sentinel)."""
    starts = np.zeros(1, dtype=np.int64)
    jump = nxt
    while len(starts) < n_codes:
        starts = np.concatenate([starts, jump[starts]])
        if len(starts) < n_codes:
            jump = jump[jump]
    return starts[:n_codes]


def _header(n: int, seed: int) -> bytes:
    return np.array([n, seed], dtype="<i8").tobytes()


def _parse_header(buf: bytes) -> tuple[int, int, np.ndarray]:
    n, seed = np.frombuffer(buf[:16], dtype="<i8")
    bits = np.unpackbits(np.frombuffer(buf[16:], dtype=np.uint8))
    return int(n), int(seed), bits


# --------------------------------------------------------------------------
# C1: delta-of-delta timestamps
# --------------------------------------------------------------------------


def encode_dod(ts: np.ndarray) -> bytes:
    """Encode an int64 µs timestamp array (any monotonicity; dods are signed)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    if n == 0:
        return _header(0, 0)
    if n == 1:
        return _header(1, int(ts[0]))
    deltas = np.diff(ts)
    dod = np.diff(deltas, prepend=np.int64(0))  # dod[0] = first delta
    cls = np.select(
        [
            dod == 0,
            (dod >= -64) & (dod <= 63),
            (dod >= -256) & (dod <= 255),
            (dod >= -2048) & (dod <= 2047),
            (dod >= -(1 << 31)) & (dod <= (1 << 31) - 1),
        ],
        [0, 1, 2, 3, 4],
        default=5,
    )
    plen = np.take(_DOD_PAYLOAD, cls)
    pfx_len = np.take(_DOD_PREFIX_LEN, cls)
    pfx_val = np.take(_DOD_PREFIX_VAL, cls).astype(np.uint64)
    # payload as offset-binary unsigned; 64-bit class flips the sign bit.
    # masked assignment (not np.where) so the int64 bias never overflows
    pay = np.zeros(len(dod), dtype=np.uint64)
    small = (plen > 0) & (plen < 64)
    if small.any():
        bias = np.int64(1) << (plen[small] - 1).astype(np.int64)
        pay[small] = (dod[small] + bias).view(np.uint64)
    wide = plen == 64
    if wide.any():
        pay[wide] = dod[wide].view(np.uint64) ^ np.uint64(1 << 63)
    lengths = pfx_len + plen
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    total = int(offsets[-1] + lengths[-1])
    # merge prefix+payload into one ≤69-bit write? prefixes are ≤5 bits and
    # payloads ≤64 — write them as two scatter passes to stay within uint64
    bits = np.zeros(total, dtype=bool)
    bits |= _write_bits(total, offsets, pfx_val, pfx_len)
    bits |= _write_bits(total, offsets + pfx_len, pay, plen)
    return _header(n, int(ts[0])) + np.packbits(bits).tobytes()


def _dod_lengths(bits: np.ndarray) -> np.ndarray:
    """Code length at every bit position (vectorized, padded lookahead)."""
    b = np.concatenate([bits, np.zeros(5, dtype=bits.dtype)]).astype(bool)
    b0, b1, b2, b3, b4 = (b[k : k + len(bits)] for k in range(5))
    return np.select(
        [~b0, ~b1, ~b2, ~b3, ~b4],
        [1, 2 + 7, 3 + 9, 4 + 12, 5 + 32],
        default=5 + 64,
    ).astype(np.int64)


def decode_dod(buf: bytes) -> np.ndarray:
    """Exact inverse of :func:`encode_dod`."""
    n, t0, bits = _parse_header(buf)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.array([t0], dtype=np.int64)
    L = _dod_lengths(bits)
    B = len(bits)
    nxt = np.minimum(np.arange(B, dtype=np.int64) + L, B)
    nxt = np.concatenate([nxt, [B]])  # sentinel self-loop
    starts = _chase_starts(nxt, n - 1)
    lens = L[starts]
    dod = np.zeros(n - 1, dtype=np.int64)
    bitsb = np.concatenate([bits, np.zeros(80, dtype=bits.dtype)]).astype(bool)
    for cls, (plen, pfx_len) in enumerate(zip(_DOD_PAYLOAD, _DOD_PREFIX_LEN)):
        sel = lens == pfx_len + plen
        if not sel.any() or plen == 0:
            continue
        u = _read_bits(bitsb, starts[sel] + pfx_len, plen)
        if plen == 64:
            dod[sel] = (u ^ np.uint64(1 << 63)).view(np.int64)
        else:
            dod[sel] = u.astype(np.int64) - (1 << (plen - 1))
    deltas = np.cumsum(dod)
    return t0 + np.concatenate([[np.int64(0)], np.cumsum(deltas)])


# --------------------------------------------------------------------------
# C2: XOR value codec
# --------------------------------------------------------------------------


#: below this length the pure-Python-int bit paths beat the vectorized ones:
#: the numpy XOR encoder/decoder carry ~0.4/0.2 ms of fixed small-array
#: allocation cost per CALL (clz/ctz popcounts, length chases), which
#: dominates sparse-channel archives where most (conv, bucket) groups hold a
#: handful of rows (measured: the q81 events archive averages 1.05 rows per
#: 1h bucket, and the fast path cut encode+decode from ~0.6 ms to ~4 µs per
#: bucket).  The int-accumulator packing is quadratic in n (every append
#: shifts the whole big int), so the threshold must stay where measured
#: cost still favors it: enc/dec small vs vec is 0.3/0.3 ms vs 4.4/2.9 ms
#: at n=256, 2.6/3.2 vs 6.8/6.4 at n=1024, 34/42 vs 8/26 at n=4096.
#: Both paths produce BYTE-IDENTICAL streams (parity-gated in test_codecs).
_XOR_SMALL_N = 1024


def _encode_xor_small(u: np.ndarray) -> bytes:
    """Python-int bit packing of the SAME stream format as the vectorized
    encoder — MSB-first control/lz/mlen/meaningful fields, zero-padded to a
    byte boundary."""
    acc = 0
    nbits = 0
    prev = 0
    for val in u.tolist():
        x = val ^ prev
        prev = val
        if x == 0:
            acc <<= 1
            nbits += 1
            continue
        lz = 64 - x.bit_length()
        if lz > 31:
            lz = 31
        tz = (x & -x).bit_length() - 1
        mlen = 64 - lz - tz
        acc = (acc << 12) | (1 << 11) | (lz << 6) | (mlen - 1)
        acc = (acc << mlen) | (x >> tz)
        nbits += 12 + mlen
    pad = (-nbits) % 8
    return _header(len(u), 0) + (acc << pad).to_bytes((nbits + pad) // 8, "big")


def encode_xor(vals: np.ndarray) -> bytes:
    """Encode a float64 (or int64-viewed) array via XOR-with-previous."""
    v = np.asarray(vals)
    u = v.view(np.uint64) if v.dtype != np.uint64 else v
    n = len(u)
    if n == 0:
        return _header(0, 0)
    if n <= _XOR_SMALL_N:
        return _encode_xor_small(u)
    x = u ^ np.concatenate([[np.uint64(0)], u[:-1]])  # first value vs 0
    nz = x != 0
    lz = np.minimum(_clz64(x), 31)
    tz = np.where(nz, _ctz64(x), 0)
    mlen = np.where(nz, 64 - lz - tz, 0).astype(np.int64)
    lengths = np.where(nz, 1 + 5 + 6 + mlen, 1).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    total = int(offsets[-1] + lengths[-1])
    bits = np.zeros(total, dtype=bool)
    bits[offsets[nz]] = True  # control '1'
    bits |= _write_bits(total, offsets + 1, lz.astype(np.uint64), np.where(nz, 5, 0))
    bits |= _write_bits(
        total,
        offsets + 6,
        np.maximum(mlen - 1, 0).astype(np.uint64),
        np.where(nz, 6, 0),
    )
    bits |= _write_bits(total, offsets + 12, x >> tz.astype(np.uint64), mlen)
    return _header(n, 0) + np.packbits(bits).tobytes()


def _xor_lengths(bits: np.ndarray) -> np.ndarray:
    b = np.concatenate([bits, np.zeros(12, dtype=bits.dtype)]).astype(bool)
    B = len(bits)
    mlen = np.zeros(B, dtype=np.int64)
    for j in range(6):
        mlen = (mlen << 1) | b[6 + j : 6 + j + B].astype(np.int64)
    return np.where(b[:B], 1 + 5 + 6 + mlen + 1, 1).astype(np.int64)


def _decode_xor_small(n: int, payload: bytes) -> np.ndarray:
    """Python-int bit walk — exact inverse of :func:`_encode_xor_small`
    (and, byte-for-byte, of the vectorized encoder)."""
    big = int.from_bytes(payload, "big")
    total = len(payload) * 8
    pos = 0
    out = np.empty(n, dtype=np.uint64)
    prev = 0
    for i in range(n):
        if (big >> (total - pos - 1)) & 1:
            field = (big >> (total - pos - 12)) & 0x7FF  # lz(5) + mlen-1(6)
            lz = field >> 6
            mlen = (field & 0x3F) + 1
            pay = (big >> (total - pos - 12 - mlen)) & ((1 << mlen) - 1)
            prev ^= pay << (64 - lz - mlen)
            pos += 12 + mlen
        else:
            pos += 1
        out[i] = prev
    return out


def decode_xor(buf: bytes, dtype=np.float64) -> np.ndarray:
    """Exact inverse of :func:`encode_xor`."""
    n = int(np.frombuffer(buf[:8], dtype="<i8")[0])
    if n == 0:
        return np.empty(0, dtype=dtype)
    if n <= _XOR_SMALL_N:
        u = _decode_xor_small(n, buf[16:])
        return u.view(dtype) if dtype != np.uint64 else u
    n, _seed, bits = _parse_header(buf)
    L = _xor_lengths(bits)
    B = len(bits)
    nxt = np.minimum(np.arange(B, dtype=np.int64) + L, B)
    nxt = np.concatenate([nxt, [B]])
    starts = _chase_starts(nxt, n)
    bitsb = np.concatenate([bits, np.zeros(80, dtype=bits.dtype)]).astype(bool)
    nz = bitsb[starts]
    x = np.zeros(n, dtype=np.uint64)
    if nz.any():
        s = starts[nz]
        mlen = _read_bits(bitsb, s + 6, 6).astype(np.int64) + 1
        lz = _read_bits(bitsb, s + 1, 5).astype(np.int64)
        # meaningful bits are variable-length: loop over distinct lengths
        pay = np.zeros(len(s), dtype=np.uint64)
        for ml in np.unique(mlen):
            sel = mlen == ml
            pay[sel] = _read_bits(bitsb, s[sel] + 12, int(ml))
        tz = 64 - lz - mlen
        x[nz] = pay << tz.astype(np.uint64)
    u = np.bitwise_xor.accumulate(x)
    return u.view(dtype) if dtype != np.uint64 else u
