"""geohash_encode: vectorized impl vs a per-point bit-loop reference."""

import numpy as np
import pytest

from solaris_ray.stages.zorder import geohash_encode

_A = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref(x, y, x_max, y_max, chars):
    bits = chars * 5 // 2
    lon = x * (1 << bits) // x_max
    lat = y * (1 << bits) // y_max
    code = 0
    for i in range(bits):  # MSB first: lon bit, then lat bit
        code = (code << 1) | ((lon >> (bits - 1 - i)) & 1)
        code = (code << 1) | ((lat >> (bits - 1 - i)) & 1)
    out = ""
    for j in range(chars):
        out += _A[(code >> (5 * (chars - 1 - j))) & 31]
    return out


def test_matches_reference():
    rng = np.random.RandomState(2)
    for chars in (2, 4, 6, 8):
        x = rng.randint(0, 3200, 200).astype(np.int64)
        y = rng.randint(0, 3200, 200).astype(np.int64)
        got = geohash_encode(x, y, 3200, 3200, chars=chars)
        for xi, yi, g in zip(x.tolist(), y.tolist(), got.tolist()):
            assert g == _ref(xi, yi, 3200, 3200, chars)


def test_corners_and_prefix_property():
    x = np.array([0, 3199, 1600], np.int64)
    y = np.array([0, 3199, 1600], np.int64)
    g6 = geohash_encode(x, y, 3200, 3200, chars=6)
    g4 = geohash_encode(x, y, 3200, 3200, chars=4)
    assert g6[0] == "000000"
    # shorter geohashes are prefixes of longer ones (same cell family)
    for a, b in zip(g4.tolist(), g6.tolist()):
        assert b.startswith(a)


def test_rejects_odd_chars_and_out_of_grid():
    x = np.array([1], np.int64)
    with pytest.raises(ValueError, match="even"):
        geohash_encode(x, x, 10, 10, chars=5)
    with pytest.raises(ValueError, match="grid"):
        geohash_encode(np.array([10], np.int64), x, 10, 10, chars=4)
