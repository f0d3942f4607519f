"""DCT perceptual hash (solaris_ray/stages/phash.py)."""

import numpy as np
import pyarrow as pa

from solaris_ray.raster.codec import encode
from solaris_ray.stages.phash import PhashImages, _area_resize_32, compute_phash


def _ham(a, b):
    return bin((a ^ b) & (2 ** 64 - 1)).count("1")


def _base_img(k, w=96, h=64):
    yy, xx = np.indices((h, w), dtype=np.float64)
    a = (128 + 70 * np.sin(xx / 11 + 2 * k) * np.cos(yy / 7 + k)
         + 25 * np.sin((xx + 2 * yy) / 17 + 3 * k))
    return np.stack([a, a * 0.9 + 10, a * 1.05 - 5],
                    -1).clip(30, 225).astype(np.uint8)


def test_brightness_shift_is_hash_exact():
    """A constant shift moves only the DC coefficient; every AC bit
    and the AC median are untouched."""
    for k in range(5):
        img = _base_img(k)
        h0 = compute_phash(img)
        for d in (-30, -10, 10, 30):
            shifted = np.clip(img.astype(np.int16) + d, 0, 255).astype(np.uint8)
            assert compute_phash(shifted) == h0


def test_jpeg_recompression_small_distance_and_separation():
    from solaris_ray.raster.jpeg import jpeg_decode, jpeg_encode

    hashes = []
    for k in range(8):
        img = _base_img(k)
        h0 = compute_phash(img)
        hj = compute_phash(jpeg_decode(jpeg_encode(img, quality=85)))
        assert _ham(h0, hj) <= 3
        hashes.append(h0)
    dists = [_ham(hashes[i], hashes[j])
             for i in range(8) for j in range(i + 1, 8)]
    assert min(dists) >= 8  # distinct content stays far


def test_area_resize_exact_on_blocks():
    """Block-constant images resize to exactly their block values."""
    img = np.kron(np.arange(32 * 32, dtype=np.float64).reshape(32, 32),
                  np.ones((3, 3)))
    out = _area_resize_32(img)
    assert np.allclose(out, np.arange(32 * 32).reshape(32, 32))


def test_phash_stage_over_bytes():
    imgs = [_base_img(k) for k in range(3)]
    tbl = pa.table({
        "image_id": pa.array([10, 11, 12], pa.int64()),
        "bytes": pa.array([encode(im, "png") for im in imgs]),
        "fmt": pa.array(["png"] * 3),
    })
    out = PhashImages()(tbl).to_pandas()
    assert list(out["image_id"]) == [10, 11, 12]
    for i, im in enumerate(imgs):
        assert out["phash"].iloc[i] == compute_phash(im)


def test_grayscale_and_odd_sizes():
    rng = np.random.default_rng(4)
    for shape in ((37, 53), (64, 64, 1), (200, 31, 3)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        h = compute_phash(img)
        assert isinstance(h, int)
        assert compute_phash(img) == h  # deterministic


def test_small_image_brightness_invariance():
    """Sub-32px images must keep the brightness-shift invariance
    (review finding: rounded edges collided into zero-area cells)."""
    rng = np.random.default_rng(9)
    for shape in ((16, 16), (8, 24), (31, 31), (20, 40)):
        img = rng.integers(40, 200, shape).astype(np.uint8)
        h0 = compute_phash(img)
        for d in (-20, 10, 30):
            shifted = np.clip(img.astype(np.int16) + d, 0, 255).astype(np.uint8)
            assert compute_phash(shifted) == h0, (shape, d)


def test_undecodable_rows_dropped_not_fatal():
    imgs = [_base_img(k) for k in range(2)]
    tbl = pa.table({
        "image_id": pa.array([1, 2, 3], pa.int64()),
        "bytes": pa.array([encode(imgs[0], "png"), b"not an image",
                           encode(imgs[1], "png")]),
        "fmt": pa.array(["png", "bmp", "png"]),
    })
    out = PhashImages()(tbl).to_pandas()
    assert list(out["image_id"]) == [1, 3]


def test_ahash_dhash_invariances_and_stage_algo():
    from solaris_ray.stages.phash import compute_ahash, compute_dhash

    hs = {"a": [], "d": []}
    for k in range(6):
        img = _base_img(k)
        for key, fn in (("a", compute_ahash), ("d", compute_dhash)):
            h0 = fn(img)
            shifted = np.clip(img.astype(np.int16) + 15, 0, 255).astype(np.uint8)
            assert fn(shifted) == h0  # brightness-exact
            hs[key].append(h0)
    for key in hs:
        dists = [_ham(hs[key][i], hs[key][j])
                 for i in range(6) for j in range(i + 1, 6)]
        assert min(dists) >= 5
    # the stage dispatches by algo
    tbl = pa.table({
        "image_id": pa.array([1], pa.int64()),
        "bytes": pa.array([encode(_base_img(0), "png")]),
        "fmt": pa.array(["png"]),
    })
    out_a = PhashImages(algo="ahash")(tbl).to_pandas()["phash"].iloc[0]
    out_d = PhashImages(algo="dhash")(tbl).to_pandas()["phash"].iloc[0]
    assert out_a == compute_ahash(_base_img(0))
    assert out_d == compute_dhash(_base_img(0))
    assert out_a != out_d
