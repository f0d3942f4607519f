"""Pure-numpy FLAC codec (solaris_ray/stages/flac.py).

Own-encoder roundtrips are exact (lossless).  Foreign-feature frames
(LPC, mid/side, multi-partition rice, rice2, wasted bits) are
hand-built with the module's bit sink — the decode paths real FLAC
encoders emit but ours doesn't.
"""

import struct

import numpy as np
import pytest

from solaris_ray.stages import flac
from solaris_ray.stages.flac import (
    _BitSink, _crc8, _crc16, _utf8_number, flac_decode, flac_encode)


def test_roundtrip_mono_exact_various_lengths():
    rng = np.random.default_rng(5)
    for n in (1, 7, 192, 4095, 4096, 4097, 9000):
        s = rng.integers(-30000, 30000, n).astype(np.int16)
        back, rate = flac_decode(flac_encode(s, 16000))
        assert rate == 16000 and back.shape == (n, 1)
        assert np.array_equal(back[:, 0], s)


def test_roundtrip_stereo_and_compression():
    rng = np.random.default_rng(6)
    st = rng.integers(-2000, 2000, (5000, 2)).astype(np.int16)
    back, rate = flac_decode(flac_encode(st, 8000))
    assert rate == 8000 and np.array_equal(back, st)
    t = np.arange(20000)
    smooth = (5000 * np.sin(t / 50.0)).astype(np.int16)
    buf = flac_encode(smooth, 44100)
    assert len(buf) < 0.3 * smooth.nbytes  # fixed predictors really compress
    assert np.array_equal(flac_decode(buf)[0][:, 0], smooth)


def test_roundtrip_constant_extremes_custom_rate():
    z = np.zeros(6000, np.int16)
    assert np.array_equal(flac_decode(flac_encode(z, 8000))[0][:, 0], z)
    e = np.array([-32768, 32767, 0, -1, 1] * 1000, np.int16)
    assert np.array_equal(flac_decode(flac_encode(e, 48000))[0][:, 0], e)
    s = np.arange(300, dtype=np.int16)
    back, rate = flac_decode(flac_encode(s, 11025))  # not in the rate table
    assert rate == 11025 and np.array_equal(back[:, 0], s)


def test_corruption_detected_by_crc16():
    s = (np.arange(5000) % 251 - 125).astype(np.int16)
    buf = bytearray(flac_encode(s, 8000))
    buf[len(buf) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        flac_decode(bytes(buf))


def test_not_flac_raises():
    with pytest.raises(ValueError):
        flac_decode(b"RIFFxxxxWAVE")


# --- foreign-feature frames -------------------------------------------------


def _streaminfo(n, rate=8000, ch=1, bps=16):
    si = _BitSink()
    si.put(4096, 16); si.put(4096, 16); si.put(0, 24); si.put(0, 24)
    si.put(rate, 20); si.put(ch - 1, 3); si.put(bps - 1, 5); si.put(n, 36)
    body = si.to_bytes() + b"\x00" * 16  # md5 unknown -> decoder skips check
    return b"fLaC" + bytes([0x80, 0, 0, len(body)]) + body


def _frame(bs, ch_code, subframe_bits, rate_code=4, bps_code=4):
    hdr = _BitSink()
    hdr.put(0b11111111111110, 14); hdr.put(0, 1); hdr.put(0, 1)
    hdr.put(7, 4)            # 16-bit explicit block size
    hdr.put(rate_code, 4)
    hdr.put(ch_code, 4)
    hdr.put(bps_code, 3); hdr.put(0, 1)
    hb = hdr.to_bytes() + _utf8_number(0) + struct.pack(">H", bs - 1)
    hb += bytes([_crc8(hb)])
    fr = hb + subframe_bits.to_bytes()
    return fr + struct.pack(">H", _crc16(fr))


def _put_rice(sink, res, k, method=0, po=0, pred_order=0, bs=None):
    pbits = 4 if method == 0 else 5
    sink.put(method, 2)
    sink.put(po, 4)
    res = np.asarray(res, np.int64)
    bs = bs if bs is not None else len(res) + pred_order
    off = 0
    for p in range(1 << po):
        cnt = (bs >> po) - (pred_order if p == 0 else 0)
        part = res[off:off + cnt]
        off += cnt
        kp = k[p] if isinstance(k, (list, tuple)) else k
        sink.put(kp, pbits)
        zz = (part << 1) ^ (part >> 63)
        vals = (np.int64(1) << kp) | (zz & ((np.int64(1) << kp) - 1))
        sink.put_arrays(vals, (zz >> kp) + 1 + kp)


def test_foreign_lpc_subframe():
    """LPC order 2: s[i] = res[i] + (c0*s[i-1] + c1*s[i-2]) >> shift."""
    rng = np.random.default_rng(9)
    n = 600
    coefs = [3, -1]          # applied to s[i-1], s[i-2]
    shift = 1
    res = rng.integers(-40, 40, n - 2).astype(np.int64)
    s = np.zeros(n, np.int64)
    s[0], s[1] = 100, 130
    for i in range(2, n):
        s[i] = res[i - 2] + ((coefs[0] * s[i - 1] + coefs[1] * s[i - 2]) >> shift)
    assert np.abs(s).max() < 32768
    body = _BitSink()
    body.put(0, 1)
    body.put(0b100001, 6)    # LPC order 2 (1xxxxx, order-1=1)
    body.put(0, 1)           # no wasted bits
    body.put(int(s[0]), 16); body.put(int(s[1]), 16)
    body.put(14, 4)          # precision 15
    body.put(shift, 5)
    body.put(coefs[0], 15); body.put(coefs[1] & 0x7FFF, 15)
    _put_rice(body, res, k=4, pred_order=2, bs=n)
    buf = _streaminfo(n) + _frame(n, ch_code=0, subframe_bits=body)
    back, rate = flac_decode(buf)
    assert np.array_equal(back[:, 0], s)


def test_foreign_mid_side_and_left_side():
    rng = np.random.default_rng(10)
    n = 512
    left = rng.integers(-5000, 5000, n).astype(np.int64)
    right = rng.integers(-5000, 5000, n).astype(np.int64)
    mid = (left + right) >> 1
    side = left - right

    def verbatim(sink, vals, bps):
        sink.put(0, 1); sink.put(1, 6); sink.put(0, 1)
        sink.put_arrays(np.asarray(vals) & ((1 << bps) - 1),
                        np.full(len(vals), bps))

    # mid/side (ch_code 10): mid 16 bit, side 17 bit
    body = _BitSink()
    verbatim(body, mid, 16)
    verbatim(body, side, 17)
    buf = _streaminfo(n, ch=2) + _frame(n, ch_code=10, subframe_bits=body)
    back, _ = flac_decode(buf)
    assert np.array_equal(back[:, 0], left) and np.array_equal(back[:, 1], right)

    # left/side (ch_code 8): left 16, side 17
    body = _BitSink()
    verbatim(body, left, 16)
    verbatim(body, side, 17)
    buf = _streaminfo(n, ch=2) + _frame(n, ch_code=8, subframe_bits=body)
    back, _ = flac_decode(buf)
    assert np.array_equal(back[:, 0], left) and np.array_equal(back[:, 1], right)

    # right/side (ch_code 9): side 17, right 16
    body = _BitSink()
    verbatim(body, side, 17)
    verbatim(body, right, 16)
    buf = _streaminfo(n, ch=2) + _frame(n, ch_code=9, subframe_bits=body)
    back, _ = flac_decode(buf)
    assert np.array_equal(back[:, 0], left) and np.array_equal(back[:, 1], right)


def test_foreign_multi_partition_rice2_and_escape():
    """Partition order 2 (4 partitions), 5-bit rice2 params, one escape
    partition holding raw 12-bit residuals."""
    rng = np.random.default_rng(11)
    n = 512
    s = np.cumsum(rng.integers(-30, 30, n)).astype(np.int64)
    assert np.abs(s).max() < 32768
    res = np.diff(s)  # fixed order 1
    body = _BitSink()
    body.put(0, 1); body.put(0b001001, 6); body.put(0, 1)  # FIXED order 1
    body.put(int(s[0]), 16)
    body.put(1, 2)   # method 1: rice2, 5-bit params
    body.put(2, 4)   # partition order 2
    off = 0
    for p in range(4):
        cnt = (n >> 2) - (1 if p == 0 else 0)
        part = res[off:off + cnt]
        off += cnt
        if p == 2:   # escape partition
            body.put(31, 5)
            body.put(12, 5)
            body.put_arrays(part & 0xFFF, np.full(cnt, 12))
        else:
            k = 6
            zz = (part << 1) ^ (part >> 63)
            body.put(k, 5)
            body.put_arrays((np.int64(1) << k) | (zz & ((np.int64(1) << k) - 1)),
                            (zz >> k) + 1 + k)
    buf = _streaminfo(n) + _frame(n, ch_code=0, subframe_bits=body)
    back, _ = flac_decode(buf)
    assert np.array_equal(back[:, 0], s)


def test_foreign_wasted_bits():
    """Samples with w low zero bits: subframe stores s >> w at bps-w,
    decoder shifts back."""
    rng = np.random.default_rng(12)
    n = 256
    w = 3
    s = (rng.integers(-3000, 3000, n).astype(np.int64) << w)
    body = _BitSink()
    body.put(0, 1); body.put(1, 6)      # VERBATIM
    body.put(1, 1)                       # wasted-bits flag
    body.put(1, w)                       # unary w-1 zeros then 1 -> wasted=w
    shifted = s >> w
    body.put_arrays(shifted & ((1 << (16 - w)) - 1), np.full(n, 16 - w))
    buf = _streaminfo(n) + _frame(n, ch_code=0, subframe_bits=body)
    back, _ = flac_decode(buf)
    assert np.array_equal(back[:, 0], s)


def test_md5_verification_catches_tamper():
    """A frame whose samples differ from the MD5'd stream must raise
    even when its own CRC is valid (rebuilt after tampering)."""
    s = (np.arange(600) % 100 - 50).astype(np.int16)
    buf = flac_encode(s, 8000)
    s2 = s.copy()
    s2[5] += 1
    buf2 = flac_encode(s2, 8000)
    # splice: streaminfo (with s's md5) + frames of s2
    split = buf.index(b"\xff\xf8")
    tampered = buf[:split] + buf2[buf2.index(b"\xff\xf8"):]
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(tampered)
    flac_decode(tampered, check=False)  # opt-out path still decodes


def test_stereo_decorrelation_engages_and_stays_lossless():
    """Correlated stereo must pick a side-channel mode (smaller file)
    and still roundtrip exactly; independent noise stays exact too."""
    rng = np.random.default_rng(6)
    n = 20000
    L = np.cumsum(rng.integers(-80, 80, n)).clip(-20000, 20000).astype(np.int16)
    # identical channels: side channel is constant 0, nearly free —
    # independent encoding would cost ~2x the mono file
    st = np.stack([L, L], -1)
    buf = flac_encode(st, 16000)
    assert np.array_equal(flac_decode(buf)[0], st)
    mono_alone = flac_encode(L, 16000)
    assert len(buf) < 1.15 * len(mono_alone)
    # correlated-but-noisy channels still roundtrip exactly
    R = (L + rng.integers(-50, 50, n)).clip(-32768, 32767).astype(np.int16)
    st2 = np.stack([L, R], -1)
    assert np.array_equal(flac_decode(flac_encode(st2, 16000))[0], st2)
    # independent noise falls back gracefully and stays exact
    st3 = rng.integers(-20000, 20000, (4000, 2)).astype(np.int16)
    assert np.array_equal(flac_decode(flac_encode(st3, 16000))[0], st3)


def test_lpc_encoding_engages_on_tonal_content():
    """Dual-sine content: LPC-8 must beat fixed predictors (residual
    mass ~3x lower) and stay bit-exact."""
    t = np.arange(40000)
    tone = (9000 * np.sin(2 * np.pi * 440 * t / 16000)
            + 4000 * np.sin(2 * np.pi * 1210 * t / 16000)).astype(np.int16)
    buf = flac_encode(tone, 16000)
    back, _ = flac_decode(buf)
    assert np.array_equal(back[:, 0], tone)
    assert len(buf) < 0.55 * tone.nbytes
    # an LPC subframe type byte (0b1xxxxx0x with order 8 -> 0x4E) must
    # actually appear — i.e. the branch engaged, not just fixed
    from solaris_ray.stages.flac import _lpc_analyze

    blk = tone[:4096].astype(np.int64)
    q, shift, res = _lpc_analyze(blk, 8)
    from solaris_ray.stages.flac import _fixed_residual

    best_fixed = min(int(np.abs(_fixed_residual(blk, o)).sum())
                     for o in range(5))
    assert int(np.abs(res).sum()) * 2 < best_fixed
