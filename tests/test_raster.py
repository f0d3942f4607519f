"""Raster codec + kernel unit tests (golden-style literal fixtures,
mirroring /root/reference/tests/test_vector/test_mask.py's approach of
exact array equality on small masks)."""

import numpy as np
import pytest

from solaris_ray.raster.codec import (
    decode,
    encode,
    png_decode,
    png_encode,
    psnr,
    qnt_decode,
    qnt_encode,
)
from solaris_ray.raster.kernels import (
    dilate_square,
    erode_square,
    label_components,
    polygonize,
    rasterize_lines,
    rasterize_rings,
    simplify_ring,
)


def _rng_img(h, w, c, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return base


class TestCodec:
    def test_png_roundtrip_rgb(self):
        img = _rng_img(37, 53, 3)
        assert np.array_equal(png_decode(png_encode(img)), img)

    def test_png_roundtrip_gray(self):
        img = _rng_img(16, 16, 1)[:, :, 0]
        assert np.array_equal(png_decode(png_encode(img)), img)

    def test_qnt_is_lossy_but_over_40db(self):
        img = _rng_img(64, 64, 3)
        back = qnt_decode(qnt_encode(img))
        assert not np.array_equal(back, img)
        p = psnr(img, back)
        assert p >= 40.0, p

    def test_dispatch(self):
        img = _rng_img(8, 8, 3)
        assert np.array_equal(decode(encode(img, "png"), "png"), img)
        assert psnr(img, decode(encode(img, "qnt"), "qnt")) >= 40.0


SQ = np.array([[2.0, 2.0], [8.0, 2.0], [8.0, 8.0], [2.0, 8.0]])


class TestRasterize:
    def test_square_fill_exact(self):
        out = rasterize_rings(SQ, np.array([0, 4]), (10, 10))
        want = np.zeros((10, 10), dtype=np.uint8)
        want[2:8, 2:8] = 255
        assert np.array_equal(out, want)

    def test_triangle_pixel_centers(self):
        tri = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
        out = rasterize_rings(tri, np.array([0, 3]), (4, 4), values=1, dtype=np.uint8)
        # pixel centers (x+.5, y+.5) strictly inside x+y<4
        want = np.array(
            [[1, 1, 1, 0], [1, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 0]], dtype=np.uint8
        )
        assert np.array_equal(out, want)

    def test_burn_field_values(self):
        coords = np.vstack([SQ, SQ / 2])
        out = rasterize_rings(coords, np.array([0, 4, 8]), (10, 10), values=np.array([7, 9]))
        assert out[5, 5] == 7 and out[2, 2] == 9  # later ring overwrites

    def test_out_of_bounds_clipped(self):
        big = SQ * 10
        out = rasterize_rings(big, np.array([0, 4]), (10, 10))
        assert out.shape == (10, 10)

    def test_lines(self):
        pts = np.array([[0.0, 5.0], [9.0, 5.0]])
        out = rasterize_lines(pts, np.array([0, 2]), (10, 10), value=1, dtype=np.uint8)
        assert out[5, :].sum() == 10 and out.sum() == 10


class TestMorphology:
    def test_dilate_erode_square(self):
        m = np.zeros((9, 9), dtype=np.uint8)
        m[4, 4] = 1
        d = dilate_square(m, 3)
        assert d.sum() == 9 and d[3:6, 3:6].all()
        assert erode_square(d, 3).sum() == 1
        # erosion then dilation of a 3-wide bar is identity (opening)
        bar = np.zeros((9, 9), dtype=np.uint8)
        bar[3:6, 1:8] = 1
        assert np.array_equal(dilate_square(erode_square(bar, 3), 3), bar)


class TestPolygonize:
    def test_label_components(self):
        m = np.zeros((6, 6), dtype=bool)
        m[0:2, 0:2] = True
        m[4:6, 4:6] = True
        labels, n = label_components(m)
        assert n == 2
        assert labels[0, 0] != labels[5, 5]

    def test_diagonal_not_connected(self):
        m = np.zeros((4, 4), dtype=bool)
        m[0, 0] = m[1, 1] = True
        _, n = label_components(m)
        assert n == 2

    def test_u_shape_single_component(self):
        m = np.zeros((5, 5), dtype=bool)
        m[1:4, 1] = True
        m[3, 1:4] = True
        m[1:4, 3] = True
        _, n = label_components(m)
        assert n == 1

    def test_polygonize_square_roundtrip(self):
        mask = rasterize_rings(SQ, np.array([0, 4]), (10, 10))
        rings = polygonize(mask)
        assert len(rings) == 1
        ring = rings[0]
        # boundary of the burned 6x6 block: corners (2,2)..(8,8)
        assert sorted(map(tuple, ring)) == [(2, 2), (2, 8), (8, 2), (8, 8)]
        # re-rasterize → identical mask
        again = rasterize_rings(ring, np.array([0, len(ring)]), (10, 10))
        assert np.array_equal(again, mask)

    def test_polygonize_min_area(self):
        m = np.zeros((10, 10), dtype=np.uint8)
        m[0, 0] = 1
        m[4:8, 4:8] = 1
        assert len(polygonize(m, min_area=2)) == 1

    def test_simplify_ring(self):
        ring = np.array([[0, 0], [5, 0.01], [10, 0], [10, 10], [0, 10]], dtype=float)
        out = simplify_ring(ring, tolerance=0.1)
        assert len(out) == 4
