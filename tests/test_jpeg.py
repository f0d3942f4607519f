"""Pure-Python baseline JPEG codec (solaris_ray.raster.jpeg)."""

import numpy as np
import pytest

from solaris_ray.raster import codec
from solaris_ray.raster.jpeg import jpeg_decode, jpeg_encode


def _smooth_rgb(h, w, k=0):
    yy, xx = np.indices((h, w), dtype=np.float64)
    return np.stack(
        [
            128 + 90 * np.sin(xx / 23 + k) * np.cos(yy / 17 + k),
            128 + 80 * np.cos(xx / 31 + k) * np.sin(yy / 13 + k),
            128 + 70 * np.sin((xx + yy) / 19 + k),
        ],
        -1,
    ).clip(0, 255).astype(np.uint8)


def _psnr(a, b):
    return codec.psnr(a, b)


def test_rgb_444_roundtrip_psnr():
    img = _smooth_rgb(128, 96)
    dec = jpeg_decode(jpeg_encode(img, quality=95))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert _psnr(img, dec) >= 45


def test_rgb_420_roundtrip_psnr_odd_size():
    img = _smooth_rgb(131, 77, k=2)
    dec = jpeg_decode(jpeg_encode(img, quality=95, subsample="420"))
    assert dec.shape == img.shape
    assert _psnr(img, dec) >= 40


def test_gray_roundtrip():
    yy, xx = np.indices((64, 80), dtype=np.float64)
    img = (128 + 100 * np.sin(xx / 11) * np.cos(yy / 9)).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=92))
    assert dec.shape == (64, 80)
    assert _psnr(img, dec) >= 42


def test_flat_image_near_exact():
    img = np.full((40, 40, 3), 77, np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=90))
    assert np.abs(dec.astype(int) - 77).max() <= 1


def test_tiny_image():
    img = _smooth_rgb(5, 3)
    dec = jpeg_decode(jpeg_encode(img, quality=95))
    assert dec.shape == (5, 3, 3)


def test_quality_monotone_size():
    img = _smooth_rgb(96, 96)
    sizes = [len(jpeg_encode(img, quality=q)) for q in (50, 75, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_byte_stuffing_roundtrip():
    # high-entropy image maximizes 0xFF byte occurrences in the stream
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (48, 48, 3), np.uint8)
    buf = jpeg_encode(img, quality=99)
    dec = jpeg_decode(buf)
    assert dec.shape == img.shape
    assert _psnr(img, dec) >= 30  # noise is jpeg's worst case


def test_codec_dispatch():
    img = _smooth_rgb(32, 32)
    buf = codec.encode(img, "jpeg")
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    dec = codec.decode(buf, "jpeg")
    assert _psnr(img, dec) >= 45


def test_garbage_raises():
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF/SOS


def test_progressive_rejected():
    # hand-built header with SOF2 (progressive) must be refused loudly
    img = _smooth_rgb(16, 16)
    buf = bytearray(jpeg_encode(img))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_decode(bytes(buf))


def test_restart_marker_segments():
    """Decoder honors DRI/RSTn: splice a DRI segment into a stream is
    hard to fake, so instead verify the segment-split path directly by
    encoding, then decoding a stream rebuilt with restart markers every
    MCU row via a re-encode through the internal writer path."""
    # 4:4:4 gray: 1 block per MCU; rebuild with DRI=4 by re-running the
    # entropy coder per 4-block group
    from solaris_ray.raster import jpeg as J

    yy, xx = np.indices((16, 32), dtype=np.float64)
    img = (128 + 90 * np.sin(xx / 7) * np.cos(yy / 5)).astype(np.uint8)
    plain = jpeg_encode(img, quality=95)

    zz = J._fdct_quant(img.astype(np.uint8), J._scale_quant(J.Q_LUM, 95))
    dc = J._canonical_codes(*J.DC_LUM)
    ac = J._canonical_codes(*J.AC_LUM)
    pieces = []
    for g in range(0, zz.shape[0], 4):
        wtr = J._BitWriter()
        J._encode_blocks(wtr, zz, np.arange(g, min(g + 4, zz.shape[0])),
                         dc, ac, 0)
        wtr.flush()
        pieces.append(bytes(wtr.out))
    # reuse header from the plain encode up to SOS payload end
    sos_at = plain.find(b"\xff\xda")
    sos_len = int.from_bytes(plain[sos_at + 2:sos_at + 4], "big")
    header = plain[:sos_at]
    dri = b"\xff\xdd\x00\x04\x00\x04"  # DRI, interval 4
    scan = bytearray()
    for i, p in enumerate(pieces):
        scan += p
        if i + 1 < len(pieces):
            scan += bytes([0xFF, 0xD0 + (i % 8)])
    rebuilt = header + dri + plain[sos_at:sos_at + 2 + sos_len] + bytes(scan) + b"\xff\xd9"
    dec = jpeg_decode(rebuilt)
    ref = jpeg_decode(plain)
    assert np.array_equal(dec, ref)
