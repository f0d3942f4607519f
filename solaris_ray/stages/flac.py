"""Pure-numpy FLAC codec (lossless audio, the speech-corpus format).

No FLAC library exists in this container, but FLAC is a fully
documented bit format (RFC 9639), so it decodes for REAL here — the
same pure-struct discipline as ``raster/gtiff.py`` / ``raster/jpeg.py``.
Reference parity target: the format itself (LibriSpeech-style 16-bit
mono/stereo corpora), cf. the reference's opaque-binary media columns
(``/root/reference/solaris/utils/io.py`` reads images the same way).

Decoder: full baseline subset —
- STREAMINFO + all metadata blocks (skipped),
- fixed + variable blocking, all block-size/rate/bps header codes,
- subframes CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32),
- wasted-bits-per-sample,
- rice residual methods 0 (4-bit params) and 1 (5-bit), any partition
  order, escape partitions,
- channel assignments independent / left-side / right-side / mid-side,
- CRC-16 frame verification (optional) and MD5 stream verification.

Rice decode is VECTORIZED: the sequential "q zeros, a one, k bits"
scan becomes pointer-doubling over the precomputed positions of 1-bits
(successor(j) = j + 1 + ones-inside-the-k-remainder, composed by
repeated squaring), so a partition decodes in O(log n) full-array
gathers instead of a per-sample Python loop.

Encoder: 4096-sample frames, per-channel best fixed predictor (order
0-4 by minimal |residual| sum), single-partition rice with escape
fallback, byte-exact CRC-8/CRC-16, real MD5.  Bit assembly is one
vectorized (value, bitlength) scatter-pack per frame — unary+remainder
of every rice code is a single (1<<k | r, q+1+k) pair.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_TBL = None
_CRC16_TBL = None


def _crc_tables():
    global _CRC8_TBL, _CRC16_TBL
    if _CRC8_TBL is None:
        t8 = np.zeros(256, np.uint8)
        for i in range(256):
            c = i
            for _ in range(8):
                c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
            t8[i] = c
        t16 = np.zeros(256, np.uint16)
        for i in range(256):
            c = i << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
            t16[i] = c
        _CRC8_TBL, _CRC16_TBL = t8, t16
    return _CRC8_TBL, _CRC16_TBL


def _crc8(data: bytes) -> int:
    t8, _ = _crc_tables()
    c = 0
    for b in data:
        c = int(t8[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    _, t16 = _crc_tables()
    c = 0
    for b in data:
        c = (int(t16[((c >> 8) ^ b) & 0xFF]) ^ (c << 8)) & 0xFFFF
    return c


# --- bit packing (encoder) -------------------------------------------------


def _pack_bits(vals: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate big-endian bit fields: vals[i] in lens[i] bits.

    Fully vectorized: one repeat/arange pass builds every output bit,
    then np.packbits.  Fields longer than 63 bits are legal (rice
    unary prefixes) — the value's high bits are zero, so the shift is
    clamped.  Returns the BIT array (callers concatenate frames before
    the final byte pack).
    """
    vals = np.asarray(vals, np.int64)
    lens = np.asarray(lens, np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, np.uint8)
    ends = np.cumsum(lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)
    v_rep = np.repeat(vals, lens)
    l_rep = np.repeat(lens, lens)
    shift = np.minimum(l_rep - 1 - within, 63)
    return ((v_rep >> shift) & 1).astype(np.uint8)


class _BitSink:
    """Accumulates (value, nbits) fields; byte-aligns per flush.

    Bulk fields stay as numpy array pairs until one concatenate in
    ``to_bytes`` — no per-element Python round-trip on the rice hot
    path."""

    def __init__(self):
        self._chunks: list[tuple[np.ndarray, np.ndarray]] = []

    def put(self, val: int, nbits: int) -> None:
        v = int(val) & ((1 << nbits) - 1) if nbits < 63 else int(val)
        self._chunks.append((np.array([v], np.int64),
                             np.array([nbits], np.int64)))

    def put_arrays(self, vals: np.ndarray, lens: np.ndarray) -> None:
        self._chunks.append((np.asarray(vals, np.int64).ravel(),
                             np.asarray(lens, np.int64).ravel()))

    def to_bytes(self) -> bytes:
        if not self._chunks:
            return b""
        bits = _pack_bits(np.concatenate([c[0] for c in self._chunks]),
                          np.concatenate([c[1] for c in self._chunks]))
        pad = (-len(bits)) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
        return np.packbits(bits).tobytes()


# --- bit reading (decoder) -------------------------------------------------


class _BitReader:
    def __init__(self, buf: bytes, start_byte: int = 0):
        self.bits = np.unpackbits(np.frombuffer(buf, np.uint8))
        self.cum = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(self.bits, dtype=np.int64)])
        self.ones = np.flatnonzero(self.bits).astype(np.int64)
        self.pos = start_byte * 8
        self.nbits = len(self.bits)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("flac: bitstream truncated")
        b = self.bits[self.pos:self.pos + n].astype(np.int64)
        self.pos += n
        return int(b @ (np.int64(1) << np.arange(n - 1, -1, -1, dtype=np.int64)))

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        i = np.searchsorted(self.ones, self.pos)
        if i >= len(self.ones):
            raise ValueError("flac: bitstream truncated (unary)")
        t = int(self.ones[i])
        q = t - self.pos
        self.pos = t + 1
        return q

    def read_array(self, count: int, width: int, signed: bool) -> np.ndarray:
        """count fields of `width` bits each, vectorized gather."""
        if count == 0:
            return np.zeros(0, np.int64)
        if width == 0:
            return np.zeros(count, np.int64)
        end = self.pos + count * width
        if end > self.nbits:
            raise ValueError("flac: bitstream truncated (array)")
        mat = self.bits[self.pos:end].reshape(count, width).astype(np.int64)
        self.pos = end
        v = mat @ (np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64))
        if signed:
            v = np.where(v >= (1 << (width - 1)), v - (1 << width), v)
        return v

    def read_rice_array(self, n: int, k: int) -> np.ndarray:
        """n rice(k) codes -> zigzag-decoded signed residuals.

        Pointer-doubling over the ones-positions array: successor of
        terminator index j skips the one consumed plus every 1-bit in
        the k remainder bits that follow it.  O(log n) array gathers.
        """
        if n == 0:
            return np.zeros(0, np.int64)
        ones, cum, pos = self.ones, self.cum, self.pos
        j0 = int(np.searchsorted(ones, pos))
        # terminator indices can't exceed j0 + n*(k+1) (each residual
        # consumes 1 one + at most k ones of remainder payload)
        m = min(len(ones) - j0, n * (k + 1) + 1)
        if m <= 0:
            raise ValueError("flac: bitstream truncated (rice)")
        loc = ones[j0:j0 + m]
        if k == 0:
            if m < n:
                raise ValueError("flac: bitstream truncated (rice)")
            t = loc[:n]
            starts = np.concatenate([[pos], t[:-1] + 1])
            v = t - starts
            self.pos = int(t[-1]) + 1
        else:
            ends = np.minimum(loc + 1 + k, self.nbits)
            succ = np.arange(m, dtype=np.int64) + 1 + (cum[ends] - cum[loc + 1])
            succ = np.minimum(succ, m - 1)  # clamp; validated below
            chain = np.empty(n, dtype=np.int64)
            chain[0] = 0
            filled = 1
            T = succ
            while filled < n:
                take = min(filled, n - filled)
                chain[filled:filled + take] = T[chain[:take]]
                filled += take
                if filled < n:
                    T = T[np.minimum(T, m - 1)]
            t = loc[chain]
            if n > 1 and not (np.diff(t) > k).all():
                raise ValueError("flac: corrupt rice partition")
            starts = np.concatenate([[pos], t[:-1] + 1 + k])
            q = t - starts
            if (q < 0).any() or int(t[-1]) + 1 + k > self.nbits:
                raise ValueError("flac: corrupt rice partition")
            rem_idx = t[:, None] + 1 + np.arange(k, dtype=np.int64)
            r = self.bits[rem_idx].astype(np.int64) @ (
                np.int64(1) << np.arange(k - 1, -1, -1, dtype=np.int64))
            v = (q << k) | r
            self.pos = int(t[-1]) + 1 + k
        return (v >> 1) ^ -(v & 1)  # zigzag

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# --- predictors ------------------------------------------------------------

# fixed-predictor residual: res = o-th order difference of the signal
_FIXED_MAX_ORDER = 4


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    d = s.astype(np.int64)
    for _ in range(order):
        d = np.diff(d)
    return d


def _fixed_restore(order: int, warm: np.ndarray, res: np.ndarray) -> np.ndarray:
    """Invert the o-th difference given o warmup samples."""
    w = warm.astype(np.int64)
    if order == 0:
        return res.astype(np.int64)
    diffs = [w]
    for _ in range(order):
        diffs.append(np.diff(diffs[-1]))
    cur = res.astype(np.int64)
    for j in range(order, 0, -1):
        cur = diffs[j - 1][-1] + np.cumsum(cur)
    return np.concatenate([w, cur])


def _lpc_restore(warm: np.ndarray, res: np.ndarray, coefs: np.ndarray,
                 shift: int) -> np.ndarray:
    o = len(coefs)
    n = len(warm) + len(res)
    out = np.empty(n, np.int64)
    out[:o] = warm
    c = np.asarray(coefs, np.int64)[::-1].copy()
    # sequential by definition (each sample feeds the next prediction);
    # only reached for foreign LPC-encoded files — our encoder emits
    # fixed predictors, which restore via vectorized cumsum above
    for i in range(o, n):
        out[i] = res[i - o] + (int(out[i - o:i] @ c) >> shift)
    return out


# --- encoder ---------------------------------------------------------------

_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def _utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (v >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((v >> shift) & 0x3F))
    return bytes(out)


def _rice_k(res: np.ndarray) -> int:
    """Standard parameter estimate: smallest k with n<<k >= sum|zigzag|."""
    n = max(len(res), 1)
    total = int(np.abs(res.astype(np.int64)).sum()) * 2
    k = 0
    while (n << k) < total and k < 14:
        k += 1
    return k


def _lpc_analyze(s64: np.ndarray, order: int = 8, precision: int = 15
                 ) -> tuple[np.ndarray, int, np.ndarray] | None:
    """Levinson-Durbin LPC -> (quantized coefs, shift, residuals).

    Prediction runs on the TRUE samples (lossless: the decoder
    reconstructs them exactly), so the encode-side residual is one
    vectorized sliding dot product — only decode is sequential.
    Returns None when the analysis is degenerate.
    """
    n = len(s64)
    if n <= order + 1:
        return None
    x = s64.astype(np.float64)
    ac = np.array([np.dot(x[: n - l], x[l:]) for l in range(order + 1)])
    if ac[0] <= 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):  # Levinson-Durbin recursion
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        kref = acc / err
        a[:i], a[i] = a[:i] - kref * a[i - 1::-1][:i], kref
        err *= 1 - kref * kref
        if err <= 0:
            return None
    cmax = np.abs(a).max()
    if not np.isfinite(cmax) or cmax == 0:
        return None
    shift = min(14, max(1, precision - 1 - int(np.ceil(np.log2(cmax + 1e-12)))))
    q = np.clip(np.round(a * (1 << shift)), -(1 << (precision - 1)),
                (1 << (precision - 1)) - 1).astype(np.int64)
    if not q.any():
        return None
    # residual via one strided matmul over true samples
    win = np.lib.stride_tricks.sliding_window_view(s64, order)[:-1]
    pred = (win @ q[::-1]) >> shift
    res = s64[order:] - pred
    return q, shift, res


def _encode_subframe(sink: _BitSink, s: np.ndarray, bps: int) -> None:
    s64 = s.astype(np.int64)
    if len(s64) and (s64 == s64[0]).all():
        sink.put(0b000000_0 << 1 | 0, 8)  # pad0 + CONSTANT + no wasted bits
        sink.put(int(s64[0]), bps)
        return
    max_o = min(_FIXED_MAX_ORDER, len(s64) - 1)
    best_o, best_cost, best_res = 0, None, s64
    for o in range(max_o + 1):
        r = _fixed_residual(s64, o)
        cost = int(np.abs(r).sum())
        if best_cost is None or cost < best_cost:
            best_o, best_cost, best_res = o, cost, r
    o, res = best_o, best_res
    # LPC-8 when it beats the best fixed predictor (bit-cost proxy:
    # residual mass; the ~150-bit coef header is charged via margin)
    lpc = _lpc_analyze(s64, order=8) if len(s64) >= 64 else None
    if lpc is not None:
        q, shift, lres = lpc
        if int(np.abs(lres).sum()) * 2 < best_cost:  # clear win only
            prec = 15
            sink.put((0b100000 | (8 - 1)) << 1, 8)  # LPC order 8
            for w in s64[:8]:
                sink.put(int(w), bps)
            sink.put(prec - 1, 4)
            sink.put(shift, 5)
            for c in q:
                sink.put(int(c), prec)
            k = _rice_k(lres)
            zz = (lres << 1) ^ (lres >> 63)
            if k < 15 and (len(zz) == 0 or int(zz.max()) >> k <= 4096):
                sink.put(0b00, 2)
                sink.put(0, 4)
                sink.put(k, 4)
                sink.put_arrays((np.int64(1) << k)
                                | (zz & ((np.int64(1) << k) - 1)),
                                (zz >> k) + 1 + k)
                return
            width = max(int(np.abs(lres).max()).bit_length() + 1, 2) \
                if len(lres) else 2
            width = min(width, 31)
            sink.put(0b00, 2)
            sink.put(0, 4)
            sink.put(0b1111, 4)
            sink.put(width, 5)
            sink.put_arrays(lres & ((1 << width) - 1),
                            np.full(len(lres), width))
            return
    # header: 0 pad, 001xxx fixed order, 0 wasted-bits flag
    sink.put((0b001000 | o) << 1, 8)
    for w in s64[:o]:  # warmup, raw bps bits
        sink.put(int(w), bps)
    # residual: method 00 (4-bit rice), partition order 0, one partition
    k = _rice_k(res)
    zz = (res << 1) ^ (res >> 63)  # zigzag (arithmetic shift sign mask)
    if k >= 15 or (len(zz) and int(zz.max()) >> k > 4096):
        # escape partition: raw two's-complement residuals
        width = max(int(np.abs(res).max()).bit_length() + 1, 2) if len(res) else 2
        width = min(width, 31)
        sink.put(0b00, 2)
        sink.put(0, 4)
        sink.put(0b1111, 4)
        sink.put(width, 5)
        sink.put_arrays(res & ((1 << width) - 1), np.full(len(res), width))
        return
    sink.put(0b00, 2)
    sink.put(0, 4)  # partition order 0
    sink.put(k, 4)
    q = zz >> k
    vals = (np.int64(1) << k) | (zz & ((np.int64(1) << k) - 1))
    lens = q + 1 + k
    sink.put_arrays(vals, lens)


def flac_encode(samples: np.ndarray, rate: int = 16000,
                block_size: int = 4096) -> bytes:
    """[n] or [n, ch] int16 -> FLAC bytes (16 bps, independent channels)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    s = np.clip(s, -32768, 32767).astype(np.int16)
    n, ch = s.shape
    if not (1 <= ch <= 8):
        raise ValueError("flac_encode: 1-8 channels")
    bps = 16
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    # STREAMINFO
    info = _BitSink()
    info.put(block_size, 16)
    info.put(block_size, 16)
    info.put(0, 24)
    info.put(0, 24)
    info.put(rate, 20)
    info.put(ch - 1, 3)
    info.put(bps - 1, 5)
    info.put(n, 36)
    streaminfo = info.to_bytes() + md5
    out = [b"fLaC", bytes([0x80, 0, 0, len(streaminfo)]), streaminfo]

    rate_code = _RATE_CODES.get(rate, 13)  # 13 -> 16-bit Hz field
    n_frames = (n + block_size - 1) // block_size
    for fi in range(n_frames):
        blk = s[fi * block_size:(fi + 1) * block_size]
        bs = blk.shape[0]
        bs_code = _BLOCKSIZE_CODES.get(bs)
        # stereo decorrelation: per frame, pick the channel assignment
        # with the smallest order-2 residual mass (the decoder handles
        # all four modes already)
        if ch == 2:
            L = blk[:, 0].astype(np.int64)
            R = blk[:, 1].astype(np.int64)
            S = L - R
            M = (L + R) >> 1

            def _cost(x):
                return int(np.abs(np.diff(np.diff(x))).sum()) if len(x) > 2 \
                    else int(np.abs(x).sum())

            modes = [
                (1, _cost(L) + _cost(R), [(L, bps), (R, bps)]),
                (8, _cost(L) + _cost(S), [(L, bps), (S, bps + 1)]),
                (9, _cost(S) + _cost(R), [(S, bps + 1), (R, bps)]),
                (10, _cost(M) + _cost(S), [(M, bps), (S, bps + 1)]),
            ]
            ch_code, _, subplan = min(modes, key=lambda m: m[1])
        else:
            ch_code = ch - 1
            subplan = [(blk[:, c], bps) for c in range(ch)]
        hdr = _BitSink()
        hdr.put(0b11111111111110, 14)
        hdr.put(0, 1)  # reserved
        hdr.put(0, 1)  # fixed blocking: number = frame index
        hdr.put(bs_code if bs_code else (6 if bs <= 256 else 7), 4)
        hdr.put(rate_code, 4)
        hdr.put(ch_code, 4)
        hdr.put(_BPS_CODES[bps], 3)
        hdr.put(0, 1)  # reserved
        hdr_bytes = hdr.to_bytes() + _utf8_number(fi)
        if bs_code is None:
            hdr_bytes += (struct.pack("B", bs - 1) if bs <= 256
                          else struct.pack(">H", bs - 1))
        if rate_code == 13:
            hdr_bytes += struct.pack(">H", rate)
        hdr_bytes += bytes([_crc8(hdr_bytes)])
        body = _BitSink()
        for sdata, sbps in subplan:
            _encode_subframe(body, sdata, sbps)
        frame = hdr_bytes + body.to_bytes()
        frame += struct.pack(">H", _crc16(frame))
        out.append(frame)
    return b"".join(out)


# --- decoder ---------------------------------------------------------------


def _read_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise ValueError("flac: bad subframe padding bit")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if t == 0:  # CONSTANT
        v = r.read_signed(bps)
        out = np.full(bs, v, np.int64)
    elif t == 1:  # VERBATIM
        out = r.read_array(bs, bps, signed=True)
    elif 8 <= t <= 12:  # FIXED, order t-8
        o = t - 8
        warm = r.read_array(o, bps, signed=True)
        res = _read_residual(r, bs, o)
        out = _fixed_restore(o, warm, res)
    elif t >= 32:  # LPC, order (t & 31) + 1
        o = (t & 31) + 1
        warm = r.read_array(o, bps, signed=True)
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = r.read_array(o, prec, signed=True)
        res = _read_residual(r, bs, o)
        out = _lpc_restore(warm, res, coefs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    return out << wasted


def _read_residual(r: _BitReader, bs: int, pred_order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if bs % nparts or bs >> po <= pred_order:
        raise ValueError("flac: bad partition order")
    parts = []
    for p in range(nparts):
        cnt = (bs >> po) - (pred_order if p == 0 else 0)
        k = r.read(pbits)
        if k == esc:
            width = r.read(5)
            parts.append(r.read_array(cnt, width, signed=True))
        else:
            parts.append(r.read_rice_array(cnt, k))
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


_BS_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256, 9: 512,
             10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}
_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
               7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def flac_decode(buf: bytes, check: bool = True) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ([n, ch] int32 samples, rate).

    ``check=True`` verifies each frame's CRC-16 and (when STREAMINFO
    carries one) the stream MD5.
    """
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    si = None
    while True:
        hdr = buf[pos:pos + 4]
        if len(hdr) < 4:
            raise ValueError("flac: truncated metadata")
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        ln = int.from_bytes(hdr[1:4], "big")
        body = buf[pos + 4:pos + 4 + ln]
        if btype == 0:
            b = _BitReader(body)
            b.read(16); b.read(16); b.read(24); b.read(24)
            rate = b.read(20)
            ch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            si = dict(rate=rate, ch=ch, bps=bps, total=total,
                      md5=body[18:34])
        pos += 4 + ln
        if last:
            break
    if si is None:
        raise ValueError("flac: no STREAMINFO")
    r = _BitReader(buf, start_byte=pos)
    chans_out: list[np.ndarray] = []
    decoded = 0
    while (si["total"] == 0 or decoded < si["total"]) and r.pos + 32 <= r.nbits:
        frame_start_byte = r.pos // 8
        sync = r.read(14)
        if sync != 0b11111111111110:
            if si["total"] == 0:
                break
            raise ValueError("flac: lost frame sync")
        r.read(1)
        r.read(1)  # blocking strategy (number decoded below either way)
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)
        # UTF-8 coded frame/sample number (value unused; trust order)
        first = r.read(8)
        extra = 0
        while first & (0x80 >> extra) and extra < 7:
            extra += 1
        if extra:
            for _ in range(extra - 1):
                r.read(8)
        if bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = _BS_TABLE.get(bs_code)
            if bs is None:
                raise ValueError("flac: reserved block size code")
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        r.read(8)  # header CRC-8 (covered by the frame CRC-16 check)
        bps = _BPS_TABLE.get(bps_code, si["bps"])
        if ch_code < 8:
            nch = ch_code + 1
            subs = [_read_subframe(r, bs, bps) for _ in range(nch)]
        elif ch_code == 8:  # left/side
            left = _read_subframe(r, bs, bps)
            side = _read_subframe(r, bs, bps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _read_subframe(r, bs, bps + 1)
            right = _read_subframe(r, bs, bps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _read_subframe(r, bs, bps)
            side = _read_subframe(r, bs, bps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("flac: reserved channel assignment")
        r.align()
        crc = r.read(16)
        if check:
            frame_bytes = buf[frame_start_byte:r.pos // 8 - 2]
            if _crc16(frame_bytes) != crc:
                raise ValueError("flac: frame CRC-16 mismatch")
        chans_out.append(np.stack(subs, axis=1))
        decoded += bs
    out = (np.concatenate(chans_out, axis=0) if chans_out
           else np.zeros((0, si["ch"]), np.int64))
    if si["total"]:
        out = out[:si["total"]]
    if check and si["md5"] != b"\x00" * 16 and si["bps"] in (8, 16, 24):
        w = si["bps"] // 8
        le = out.astype(np.int64)
        b = np.empty((out.shape[0], out.shape[1], w), np.uint8)
        for i in range(w):
            b[:, :, i] = (le >> (8 * i)) & 0xFF
        if hashlib.md5(b.tobytes()).digest() != si["md5"]:
            raise ValueError("flac: stream MD5 mismatch")
    return out.astype(np.int32), si["rate"]
