"""Pure-Python baseline JPEG codec (ITU-T T.81, sequential DCT).

Closes the last honest decode stub: the input-hint ``fmt`` column makes
jpeg corpora first-class (the reference reads them through skimage/PIL,
/root/reference/solaris/utils/io.py:6-151 ``imread``), but no
PIL/imagecodecs wheel exists in this container — so, same pure-struct
discipline as ``raster/gtiff.py`` and the PNG codec in
``raster/codec.py``:

- **Encoder**: baseline JFIF, 8-bit gray or RGB, 4:4:4 (no chroma
  subsampling), Annex K quantization tables scaled by the libjpeg
  quality formula, Annex K "typical" Huffman tables.  The 2-D FDCT is
  one ``einsum`` over ALL blocks at once; only the entropy coder loops
  per block (bounded by nonzero coefficients, not pixels).
- **Decoder**: any baseline (SOF0/SOF1) stream — 1-3 components,
  sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart markers,
  byte unstuffing.  Huffman decode uses a peek-16-bit canonical-code
  lookup per table; dequant + IDCT + level shift run vectorized over
  the whole coefficient tensor after the entropy pass.

All table constants below are the public ITU-T T.81 Annex K examples
(the same defaults libjpeg ships).  Chroma upsampling on decode is
nearest (sample replication); the acceptance gate is PSNR >= 40 dB on
round-trip, which 4:4:4 at quality >= 90 clears with margin.
"""

from __future__ import annotations

import numpy as np

# --- constants (ITU-T T.81 Annex K) ----------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int64)
Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int64)

# (bits-per-length[1..16], symbol values) — Annex K typical tables
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

# orthonormal DCT-II basis: C[u, x] = c(u) cos((2x+1) u pi / 16)
_x = np.arange(8)
_DCT = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) * np.sqrt(0.25)
_DCT[0] *= np.sqrt(0.5)


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 -> per-coefficient divisors."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """(bits, values) -> {symbol: (code, length)} canonical Huffman."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# --- bit IO -----------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1s


class _BitReader:
    """Peek-16 reader over an unstuffed entropy segment."""

    __slots__ = ("words", "nbits", "pos")

    def __init__(self, seg: bytes):
        b = np.frombuffer(seg + b"\x00\x00\x00", np.uint8).astype(np.int64)
        # words[i] = 24 bits starting at byte i (big-endian)
        w = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
        self.words = w.tolist()          # Python ints: fast scalar ops
        self.nbits = (len(seg)) * 8
        self.pos = 0

    def peek16(self) -> int:
        i = self.pos >> 3
        sh = 8 - (self.pos & 7)
        return (self.words[i] >> sh) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: s-bit magnitude -> signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _build_lookup(bits: list[int], vals: list[int]):
    """Canonical table -> (sym[65536], len[65536]) peek-16 arrays."""
    sym = np.full(65536, -1, np.int16)
    ln = np.zeros(65536, np.int8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym.tolist(), ln.tolist()


# --- encoder ----------------------------------------------------------------

def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """[Y,X] uint8 plane (dims multiple of 8) -> [n_blocks, 64] int32
    zigzagged quantized coefficients (blocks in raster order)."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coeffs = np.einsum("ui,nij,vj->nuv", _DCT, blocks, _DCT, optimize=True)
    q = np.round(coeffs.reshape(-1, 64) / qtab[None, :].astype(np.float64))
    return q.astype(np.int32)[:, ZIGZAG]


def _encode_blocks(writer: _BitWriter, zz: np.ndarray, order: np.ndarray,
                   dc_codes, ac_codes, dc_pred: int) -> int:
    """Entropy-encode blocks (rows of zz) in ``order``; returns the new
    DC predictor."""
    nz_rows = [np.nonzero(zz[i, 1:])[0] for i in order]
    w = writer.write
    for row_i, i in enumerate(order):
        block = zz[i]
        diff = int(block[0]) - dc_pred
        dc_pred = int(block[0])
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        w(code, ln)
        if s:
            w(diff if diff >= 0 else diff + (1 << s) - 1, s)
        nz = nz_rows[row_i]
        prev = -1
        for p in nz.tolist():
            run = p - prev - 1
            prev = p
            while run > 15:
                zc, zl = ac_codes[0xF0]
                w(zc, zl)
                run -= 16
            v = int(block[p + 1])
            s = abs(v).bit_length()
            code, ln = ac_codes[(run << 4) | s]
            w(code, ln)
            w(v if v >= 0 else v + (1 << s) - 1, s)
        if prev < 62:
            code, ln = ac_codes[0x00]   # EOB
            w(code, ln)
    return dc_pred


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def jpeg_encode(arr: np.ndarray, quality: int = 90,
                subsample: str = "444") -> bytes:
    """[Y,X] gray or [Y,X,3] RGB uint8 -> baseline JFIF bytes.

    ``subsample``: "444" (no chroma subsampling, highest fidelity) or
    "420" (2x2 box-averaged chroma, the common camera default)."""
    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    h, w = arr.shape[:2]
    color = arr.ndim == 3
    if color and arr.shape[2] != 3:
        raise ValueError("jpeg_encode: expected gray or 3-channel RGB")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    sub = subsample == "420" and color

    qlum = _scale_quant(Q_LUM, quality)
    qchr = _scale_quant(Q_CHR, quality)

    # pad to MCU multiples with edge replication (standard practice)
    mcu = 16 if sub else 8
    ph, pw = -h % mcu, -w % mcu
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw)) + (((0, 0),) if color else ()),
                     mode="edge")

    if color:
        f = arr.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub:
            # 2x2 box average on chroma
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
        planes = [np.clip(np.round(p), 0, 255).astype(np.uint8)
                  for p in (y, cb, cr)]
        qtabs = [qlum, qchr, qchr]
        tabsel = [0, 1, 1]
        samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3
    else:
        planes = [arr]
        qtabs = [qlum]
        tabsel = [0]
        samp = [(1, 1)]

    dc_codes = [_canonical_codes(*DC_LUM), _canonical_codes(*DC_CHR)]
    ac_codes = [_canonical_codes(*AC_LUM), _canonical_codes(*AC_CHR)]

    zzs = [_fdct_quant(p, q) for p, q in zip(planes, qtabs)]

    writer = _BitWriter()
    if len(planes) == 1:
        _encode_blocks(writer, zzs[0], np.arange(zzs[0].shape[0]),
                       dc_codes[0], ac_codes[0], 0)
    else:
        # interleaved MCUs: samp[c] blocks per component per MCU,
        # raster order within the MCU (T.81 A.2.3)
        mcus_x = planes[0].shape[1] // (8 * samp[0][0])
        mcus_y = planes[0].shape[0] // (8 * samp[0][1])
        preds = [0, 0, 0]
        orders = []       # per component: MCU-interleaved block order
        for c in range(3):
            hs, vs = samp[c]
            bw = mcus_x * hs
            idx = np.empty((mcus_y * mcus_x, vs * hs), np.int64)
            k = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    j = 0
                    for by in range(vs):
                        for bx in range(hs):
                            idx[k, j] = (my * vs + by) * bw + mx * hs + bx
                            j += 1
                    k += 1
            orders.append(idx)
        for m in range(mcus_y * mcus_x):
            for c in range(3):
                preds[c] = _encode_blocks(
                    writer, zzs[c], orders[c][m], dc_codes[tabsel[c]],
                    ac_codes[tabsel[c]], preds[c])
    writer.flush()

    out = bytearray(b"\xff\xd8")                       # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(qlum[ZIGZAG].tolist()))
    if color:
        out += _seg(0xDB, b"\x01" + bytes(qchr[ZIGZAG].tolist()))
    ncomp = 3 if color else 1
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for c in range(ncomp):
        hs, vs = samp[c]
        sof += bytes([c + 1, hs << 4 | vs, tabsel[c]])
    out += _seg(0xC0, sof)

    def _dht(tclass: int, tid: int, table) -> bytes:
        bits, vals = table
        return _seg(0xC4, bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals))

    out += _dht(0, 0, DC_LUM) + _dht(1, 0, AC_LUM)
    if color:
        out += _dht(0, 1, DC_CHR) + _dht(1, 1, AC_CHR)
    sos = bytes([ncomp])
    for c in range(ncomp):
        td = tabsel[c]
        sos += bytes([c + 1, td << 4 | td])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------

def _idct_batch(zz: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """[n, 64] zigzag coefficients + divisors -> [n, 8, 8] float64."""
    deq = (zz.astype(np.float64) * qtab[ZIGZAG][None, :])[:, UNZIGZAG]
    blocks = deq.reshape(-1, 8, 8)
    return np.einsum("iu,nuv,jv->nij", _DCT.T, blocks, _DCT.T,
                     optimize=True) + 128.0


def jpeg_decode(buf: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> [Y,X] gray or [Y,X,3] RGB uint8."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_comps: list[tuple[int, int, int]] = []
    data_start = -1

    n = len(buf)
    while pos < n:
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        length = int.from_bytes(buf[pos:pos + 2], "big")
        payload = buf[pos + 2:pos + length]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                tab = np.frombuffer(payload[p + 1:p + 65], np.uint8).astype(np.int64)
                qtabs[tq] = tab[UNZIGZAG]   # stored zigzag -> natural order
                p += 65
        elif marker in (0xC0, 0xC1):
            prec = payload[0]
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            nc = payload[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = payload[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17:p + 17 + nv])
                huff[(tc, th)] = _build_lookup(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:
            restart_interval = int.from_bytes(payload[:2], "big")
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = payload[1 + 2 * c:3 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 0xF))
            data_start = pos + length
            break
        pos += length

    if not comps or data_start < 0:
        raise ValueError("truncated JPEG (no SOF/SOS)")

    # split entropy data into restart segments, unstuffing 0xFF00
    segs: list[bytes] = []
    cur = bytearray()
    p = data_start
    while p < n:
        byte = buf[p]
        if byte != 0xFF:
            cur.append(byte)
            p += 1
            continue
        nxt = buf[p + 1] if p + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            p += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            p += 2
        else:       # EOI or next marker: end of scan
            break
    segs.append(bytes(cur))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    order = []          # (comp_idx, dc_table, ac_table) per scan comp
    for cid, td, ta in scan_comps:
        ci = next(i for i, c in enumerate(comps) if c["id"] == cid)
        order.append((ci, td, ta))

    coeff = [np.zeros((mcus_y * c["v"] * mcus_x * c["h"], 64), np.int32)
             for c in comps]

    seg_idx = -1
    reader = None
    preds = [0] * len(comps)
    for m in range(n_mcus):
        want_seg = m // restart_interval if restart_interval else 0
        if want_seg != seg_idx:
            seg_idx = want_seg
            reader = _BitReader(segs[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, td, ta in order:
            c = comps[ci]
            dsym, dlen = huff[(0, td)]
            asym, alen = huff[(1, ta)]
            bw = mcus_x * c["h"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = coeff[ci][(my * c["v"] + by) * bw + mx * c["h"] + bx]
                    # DC
                    pk = reader.peek16()
                    s = dsym[pk]
                    reader.skip(dlen[pk])
                    if s:
                        blk[0] = preds[ci] = preds[ci] + _extend(
                            reader.receive(s), s)
                    else:
                        blk[0] = preds[ci]
                    # AC
                    k = 1
                    while k < 64:
                        pk = reader.peek16()
                        rs = asym[pk]
                        reader.skip(alen[pk])
                        if rs == 0x00:
                            break
                        if rs == 0xF0:
                            k += 16
                            continue
                        k += rs >> 4
                        s = rs & 0xF
                        blk[k] = _extend(reader.receive(s), s)
                        k += 1

    planes = []
    for ci, c in enumerate(comps):
        q = qtabs[c["tq"]]
        px = _idct_batch(coeff[ci], q)
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        plane = (
            px.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # crop to the component's true size, then upsample to full res
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                              hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
